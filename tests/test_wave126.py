"""Brute-force identity tests for the housekeeping wave
(static index pruning, TTL retention GC; registry 449-450)."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd


class TestIndexPruning:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            PRUNE_DF_TAUS,
            q_index_pruning,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        df: Counter = Counter()
        for t in docs["text"]:
            df.update(
                {
                    w
                    for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split()
                    if w and w not in STOP_WORDS
                }
            )
        qterms = {t for terms in EVAL_QUERIES for t in terms}
        got = q_index_pruning(sf_tiny)
        n_terms, n_post = len(df), sum(df.values())
        for tau, (_, r) in zip(PRUNE_DF_TAUS, got.iterrows()):
            pruned = {t: d for t, d in df.items() if d <= tau}
            assert r["tau"] == tau
            assert r["n_terms"] == n_terms
            assert r["terms_pruned"] == len(pruned)
            assert r["n_postings"] == n_post
            assert r["postings_pruned"] == sum(pruned.values())
            assert r["query_terms_lost"] == len(qterms & set(pruned))

    def test_pruning_monotone_and_safe(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_index_pruning

        got = q_index_pruning(sf_tiny)
        assert got["terms_pruned"].is_monotonic_increasing
        assert got["postings_pruned"].is_monotonic_increasing
        # tail pruning removes many terms but few postings (Zipf)
        assert (got["posting_share"] <= got["term_share"] + 1e-9).all()
        # eval query terms are head terms: never silenced
        assert (got["query_terms_lost"] == 0).all()


class TestEventsGc:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            GC_HOLD_MOD,
            GC_TTL_DAYS,
            q_events_gc,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "user_id"])
        day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
        held = (ev["user_id"] % GC_HOLD_MOD == 0).astype(int)
        g = (
            pd.DataFrame({"day": day, "held": held})
            .groupby("day")
            .agg(n=("held", "size"), held=("held", "sum"))
            .reset_index()
            .sort_values("day")
        )
        cutoff = int(g["day"].max()) - GC_TTL_DAYS
        got = q_events_gc(sf_tiny)
        assert list(got["day"]) == list(g["day"])
        assert list(got["n"]) == list(g["n"])
        exp_rec = np.where(g["day"] < cutoff, g["n"] - g["held"], 0)
        assert list(got["reclaimable"]) == list(exp_rec)
        assert list(got["expired"]) == list((g["day"] < cutoff).astype(int))

    def test_holds_respected(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_events_gc

        got = q_events_gc(sf_tiny)
        assert (got["reclaimable"] + got["held_back"] <= got["n"]).all()
        exp = got[got["expired"] == 1]
        assert len(exp) > 0, "TTL must bite at test scale"
        assert (exp["reclaimable"] + exp["held_back"] == exp["n"]).all()
        assert (got[got["expired"] == 0]["reclaimable"] == 0).all()
