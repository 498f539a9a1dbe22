"""Brute-force identity tests for the rate-limit/succinct wave
(token bucket + rank directory, registry 371-372)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestTokenBucket:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            TB_CAP_MICRO,
            TB_COST_MICRO,
            TB_REFILL_DIV,
            q_token_bucket,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["user_id", "event_id", "ts"]
        )
        ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
        got = q_token_bucket(sf_tiny)
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values(["t", "event_id"])
            t = g["t"].to_numpy(np.int64)
            tokens, last = TB_CAP_MICRO, int(t[0])
            allowed = throttled = 0
            for ti in t:
                tokens = min(
                    TB_CAP_MICRO, tokens + (int(ti) - last) // TB_REFILL_DIV
                )
                last = int(ti)
                if tokens >= TB_COST_MICRO:
                    tokens -= TB_COST_MICRO
                    allowed += 1
                else:
                    throttled += 1
            row = got[got["user_id"] == uid].iloc[0]
            assert row["n_events"] == len(t)
            assert row["n_allowed"] == allowed
            assert row["n_throttled"] == throttled
            assert row["final_micro"] == tokens

    def test_bucket_behaviour(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_token_bucket

        got = q_token_bucket(sf_tiny)
        assert (got["n_allowed"] + got["n_throttled"] == got["n_events"]).all()
        assert (got["n_allowed"] >= 1).all()  # first event always passes
        # a user can never be allowed more than cap + refills over
        # their observed span
        assert (got["final_micro"] >= 0).all()


class TestRankSelectAudit:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            RANK_BLOCK,
            RANK_PROBES,
            RANK_SUPER,
            q_rank_select_audit,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        N = len(docs)
        post: dict[str, set[int]] = {}
        for did, text in zip(docs["doc_id"], docs["text"]):
            for t in {
                t for t in _raw_tokens(text) if t not in STOP_WORDS
            }:
                post.setdefault(t, set()).add(int(did))
        top = sorted(post, key=lambda t: (-len(post[t]), t))[:3]
        nblocks = (N + RANK_BLOCK - 1) // RANK_BLOCK
        nsuper = (nblocks + RANK_SUPER - 1) // RANK_SUPER
        dir_bytes = nsuper * 4 + nblocks * 2
        got = q_rank_select_audit(sf_tiny)
        assert sorted(got["term"].unique()) == sorted(top)
        for term in top:
            ids = post[term]
            sub = got[got["term"] == term].sort_values("p")
            assert len(sub) == RANK_PROBES
            assert (sub["df"] == len(ids)).all()
            assert (sub["dir_bytes"] == dir_bytes).all()
            for _, r in sub.iterrows():
                assert r["rank1"] == sum(1 for d in ids if d < r["p"])

    def test_rank_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_rank_select_audit

        got = q_rank_select_audit(sf_tiny)
        for _, sub in got.groupby("term"):
            s = sub.sort_values("p")
            assert (np.diff(s["rank1"].to_numpy()) >= 0).all()
            assert (s["rank1"] <= s["df"]).all()
