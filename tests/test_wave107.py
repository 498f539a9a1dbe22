"""Brute-force identity tests for the graph-canonical/hashing wave
(WL refinement + Zobrist, registry 411-412)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestWlRefinement:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            WL_ROUNDS,
            q_wl_refinement,
        )

        n = len(
            pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        )
        ids = np.arange(n)
        e = np.concatenate(
            [
                np.stack([ids, (ids * 5 + 1) % n], 1),
                np.stack([ids, (ids * ids * 3 + 2) % n], 1),
            ]
        )
        e = e[e[:, 0] != e[:, 1]]
        src = np.concatenate([e[:, 0], e[:, 1]])
        dst = np.concatenate([e[:, 1], e[:, 0]])
        adj: dict[int, list[int]] = {}
        for a, b in zip(src, dst):
            adj.setdefault(int(b), []).append(int(a))
        colors = {v: str(len(nb)) for v, nb in adj.items()}
        exp = [(0, len(set(colors.values())))]
        for r in range(1, WL_ROUNDS + 1):
            colors = {
                v: hashlib.md5(
                    (
                        colors[v]
                        + "|"
                        + ",".join(sorted(colors[u] for u in nb))
                    ).encode()
                ).hexdigest()
                for v, nb in adj.items()
            }
            exp.append((r, len(set(colors.values()))))
        got = q_wl_refinement(sf_tiny)
        assert list(got.itertuples(index=False, name=None)) == exp

    def test_refinement_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_wl_refinement

        got = q_wl_refinement(sf_tiny).sort_values("round")
        assert (np.diff(got["n_colors"].to_numpy()) >= 0).all()
        assert got.iloc[0]["n_colors"] >= 1


class TestZobristUpdate:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            ZOBRIST_NEW,
            ZOBRIST_STRIDE,
            _md5_low64,
            q_zobrist_update,
        )

        M63 = (1 << 63) - 1
        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        got = q_zobrist_update(sf_tiny)
        for d, t in zip(docs["doc_id"], docs["text"]):
            if d % ZOBRIST_STRIDE != 0:
                continue
            seen = sorted(set(_raw_tokens(t)))
            h = 0
            for x in seen:
                h ^= _md5_low64(f"z:{x}") & M63
            removed = seen[0]
            edit = (
                h
                ^ (_md5_low64(f"z:{removed}") & M63)
                ^ (_md5_low64(f"z:{ZOBRIST_NEW}") & M63)
            )
            row = got[got["doc_id"] == d].iloc[0]
            assert row["removed"] == removed
            assert row["h_base"] == h
            assert row["h_edit"] == edit

    def test_xor_delta_equals_recompute(self):
        from searchengine_ray.pipelines.queries import _md5_low64

        M63 = (1 << 63) - 1

        def z(t):
            return _md5_low64(f"z:{t}") & M63

        terms = {"alpha", "beta", "gamma"}
        h = 0
        for t in terms:
            h ^= z(t)
        edited = (terms - {"alpha"}) | {"delta"}
        full = 0
        for t in edited:
            full ^= z(t)
        assert full == h ^ z("alpha") ^ z("delta")
