"""Brute-force identity tests for the placement/bitmap wave
(rendezvous hashing + WAH, registry 373-374)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestRendezvousHashing:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            HRW_NODES,
            _md5_low64,
            q_rendezvous_hashing,
        )

        ids = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id"]
        )["doc_id"].astype(int)
        nodes = [f"node{i}" for i in range(HRW_NODES + 1)]
        before: dict[str, int] = {}
        after: dict[str, int] = {}
        moved: dict[str, int] = {}
        for d in ids:
            hs = [(_md5_low64(f"{d}:{nd}"), nd) for nd in nodes]
            ob = max(hs[:HRW_NODES])[1]
            oa = max(hs)[1]
            before[ob] = before.get(ob, 0) + 1
            after[oa] = after.get(oa, 0) + 1
            if oa != ob:
                moved[oa] = moved.get(oa, 0) + 1
        got = q_rendezvous_hashing(sf_tiny)
        for _, r in got.iterrows():
            nd = r["node"]
            assert r["n_before"] == before.get(nd, 0)
            assert r["n_after"] == after.get(nd, 0)
            assert r["n_moved_in"] == moved.get(nd, 0)

    def test_minimal_disruption(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            HRW_NODES,
            q_rendezvous_hashing,
        )

        got = q_rendezvous_hashing(sf_tiny)
        new = got[got["node"] == f"node{HRW_NODES}"].iloc[0]
        old = got[got["node"] != f"node{HRW_NODES}"]
        # only the new node gains; survivors only lose
        assert (old["n_moved_in"] == 0).all()
        assert new["n_before"] == 0
        assert new["n_moved_in"] == new["n_after"]
        # moved fraction is near 1/(n+1)
        total = got["n_after"].sum()
        frac = new["n_after"] / total
        assert 0.3 / (HRW_NODES + 1) < frac < 3.0 / (HRW_NODES + 1)


class TestWahAudit:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import WAH_WORD, q_wah_audit

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        N = len(docs)
        nwords = (N + WAH_WORD - 1) // WAH_WORD
        post: dict[str, set[int]] = {}
        for did, text in zip(docs["doc_id"], docs["text"]):
            for t in {t for t in _raw_tokens(text) if t not in STOP_WORDS}:
                post.setdefault(t, set()).add(int(did))
        top = sorted(post, key=lambda t: (-len(post[t]), t))[:3]
        got = q_wah_audit(sf_tiny)
        assert got["term"].tolist() == sorted(top)
        for term in top:
            bits = np.zeros(nwords * WAH_WORD, np.uint8)
            bits[list(post[term])] = 1
            pops = np.add.reduceat(bits, np.arange(0, len(bits), WAH_WORD))
            cls = np.where(pops == 0, 0, np.where(pops == WAH_WORD, 1, 2))
            n_lit = int((cls == 2).sum())
            r0 = r1 = 0
            prev = -1
            for c in cls:
                if c == 0 and prev != 0:
                    r0 += 1
                if c == 1 and prev != 1:
                    r1 += 1
                prev = int(c)
            row = got[got["term"] == term].iloc[0]
            assert row["df"] == len(post[term])
            assert row["n_literal"] == n_lit
            assert row["n_fill0_runs"] == r0
            assert row["n_fill1_runs"] == r1
            assert row["wah_bytes"] == 4 * (n_lit + r0 + r1)
            assert row["plain_bytes"] == 4 * nwords

    def test_wah_never_beats_sparse_but_bounds_plain(
        self, ray_session, sf_tiny
    ):
        from searchengine_ray.pipelines.queries import q_wah_audit

        got = q_wah_audit(sf_tiny)
        assert (got["wah_bytes"] <= got["plain_bytes"] + 8).all()
        assert (got["n_literal"] >= 0).all()
