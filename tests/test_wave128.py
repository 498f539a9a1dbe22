"""Brute-force identity tests for the capacity/eval wave
(term-cache hit curve, pass@k estimator; registry 453-454)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd


class TestCacheHitCurve:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import CACHE_SIZES, q_cache_hit_curve

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        cf: Counter = Counter()
        df: Counter = Counter()
        for t in docs["text"]:
            toks = [
                w
                for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split()
                if w and w not in STOP_WORDS
            ]
            cf.update(toks)
            df.update(set(toks))
        order = sorted(df, key=lambda t: (-df[t], t))
        total = sum(cf.values())
        got = q_cache_hit_curve(sf_tiny)
        for c, (_, r) in zip(CACHE_SIZES, got.iterrows()):
            hit = sum(cf[t] for t in order[:c])
            assert (r["cache_terms"], r["vocab"], r["workload"], r["hits"]) == (
                c,
                len(order),
                total,
                hit,
            )
            assert abs(r["hit_rate"] - hit / total) < 1e-6

    def test_curve_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cache_hit_curve

        got = q_cache_hit_curve(sf_tiny)
        assert got["hit_rate"].is_monotonic_increasing
        assert (got["hit_rate"] <= 1.0).all()


class TestPassAtK:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PASS_AT_KS,
            PASS_SUCCESS_TYPE,
            q_pass_at_k,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["user_id", "event_type"]
        )
        per = ev.groupby("user_id")["event_type"].agg(
            n="size", c=lambda s: (s == PASS_SUCCESS_TYPE).sum()
        )
        got = q_pass_at_k(sf_tiny)
        for k, (_, r) in zip(PASS_AT_KS, got.iterrows()):
            sub = per[per["n"] >= k]
            vals = [
                1.0 - (math.comb(n - c, k) / math.comb(n, k))
                for n, c in zip(sub["n"], sub["c"])
            ]
            assert r["k"] == k
            assert r["n_tasks"] == len(sub)
            assert abs(r["pass_at_k"] - np.mean(vals)) < 1e-6

    def test_estimator_monotone_in_k(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_pass_at_k

        got = q_pass_at_k(sf_tiny)
        # more samples can only raise the chance of at least one pass
        assert got["pass_at_k"].is_monotonic_increasing
        assert ((got["pass_at_k"] >= 0) & (got["pass_at_k"] <= 1)).all()
