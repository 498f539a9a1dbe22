"""Brute-force identity tests for the local-clustering / eval-ndcg /
Mann-Whitney / attribution / unpivot / ORC-roundtrip wave (registry
236-241)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _und_edges(n: int) -> set[tuple[int, int]]:
    ids = np.arange(n, dtype=np.int64)
    e = np.concatenate(
        [
            np.stack([ids, (ids * 7 + 13) % n], axis=1),
            np.stack([ids, (ids * 31 + 5) % n], axis=1),
            np.stack([ids, ids % 10], axis=1),
        ]
    )
    e = e[e[:, 0] != e[:, 1]]
    return {(min(a, b), max(a, b)) for a, b in e.tolist()}




class TestEvalNdcg:
    def test_metric_contracts(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import EVAL_QUERIES, q_eval_ndcg

        got = q_eval_ndcg(sf_tiny)
        assert list(got["qid"]) == list(range(len(EVAL_QUERIES)))
        # NDCG/P@10 bounded; MRR is 0 or 1/rank with rank <= 10
        assert ((got["ndcg10"] > 0) & (got["ndcg10"] <= 1.0 + 1e-9)).all()
        assert ((got["p10"] >= 0) & (got["p10"] <= 1.0)).all()
        for v in got["mrr_full"]:
            assert v == 0.0 or any(
                abs(v - 1.0 / r) < 1e-6 for r in range(1, 11)
            )

    def test_perfect_ranker_on_degenerate_query(self, ray_session, sf_tiny):
        # single-term query: every match has rel=1, so any ranking is
        # ideal -> ndcg == 1, mrr == 1, p10 == 1 when >=10 matches
        import searchengine_ray.pipelines.queries as Q

        old = Q.EVAL_QUERIES
        Q.EVAL_QUERIES = [["join"]]
        try:
            got = Q.q_eval_ndcg(sf_tiny)
        finally:
            Q.EVAL_QUERIES = old
        assert abs(got["ndcg10"].iloc[0] - 1.0) < 1e-9
        assert got["mrr_full"].iloc[0] == 1.0
        if got["n_results"].iloc[0] >= 10:
            assert got["p10"].iloc[0] == 1.0










class TestSubstringSearch:
    def test_matches_python_containment(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SUBSTRING_PATTERN, q_substring_search

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        expect = sorted(
            int(d) for d, t in zip(docs["doc_id"], docs["text"]) if SUBSTRING_PATTERN in t
        )
        got = q_substring_search(sf_tiny)
        assert list(got["doc_id"]) == expect

    def test_trigram_pruning_is_lossless(self, ray_session, sf_tiny):
        # candidates (all-trigrams-present) must be a superset of true
        # matches: verify stage can only shrink, never invent
        import searchengine_ray.pipelines.q_search as Q

        old = Q.SUBSTRING_PATTERN
        Q.SUBSTRING_PATTERN = "scan slow"
        try:
            docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
            expect = sorted(int(d) for d, t in zip(docs["doc_id"], docs["text"]) if "scan slow" in t)
            got = Q.q_substring_search(sf_tiny)
            assert list(got["doc_id"]) == expect
        finally:
            Q.SUBSTRING_PATTERN = old




