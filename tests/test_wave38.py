"""Brute-force identity tests for the EB-shrinkage and BM25-grid wave
(registry 265-266)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestEbShrinkage:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_eb_shrinkage

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id", "event_type"])
        pu = ev.groupby("user_id").agg(
            k=("event_type", lambda s: int((s == "purchase").sum())),
            n=("event_type", "size"),
        )
        k = pu["k"].to_numpy(np.float64)
        n = pu["n"].to_numpy(np.float64)
        m = k.sum() / n.sum()
        r = k / n
        var = (r * r).sum() / len(r) - (r.sum() / len(r)) ** 2
        tau = max(m * (1 - m) / var - 1.0, 1.0)
        shrunk = np.round((k + tau * m) / (n + tau), 6)
        pu = pu.assign(shrunk=shrunk).reset_index()
        expect = pu.sort_values(["shrunk", "user_id"], ascending=[False, True]).head(10)
        got = q_eb_shrinkage(sf_tiny)
        assert list(got["user_id"]) == list(expect["user_id"])
        np.testing.assert_allclose(
            got["shrunk_rate"].to_numpy(), expect["shrunk"].to_numpy(), atol=1e-6
        )

    def test_shrinkage_pulls_toward_pooled_mean(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_eb_shrinkage

        got = q_eb_shrinkage(sf_tiny)
        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["event_type"])
        m = (ev["event_type"] == "purchase").mean()
        # every shrunk rate sits between its raw rate and the pooled mean
        for r in got.itertuples():
            lo, hi = sorted((r.raw_rate, m))
            assert lo - 1e-9 <= r.shrunk_rate <= hi + 1e-9


class TestBm25Grid:
    def test_default_combo_matches_eval_pipeline(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import BM25_GRID, q_bm25_grid

        got = q_bm25_grid(sf_tiny)
        assert len(got) == len(BM25_GRID)
        assert set(zip(got["k1"], got["b"])) == set(BM25_GRID)
        assert ((got["ndcg10"] > 0) & (got["ndcg10"] <= 1.0 + 1e-9)).all()

    def test_grid_changes_scores(self, ray_session, sf_tiny):
        # NDCG can saturate at tiny scale, but the underlying scores
        # must respond to (k1, b)
        from searchengine_ray.pipelines.queries import BM25_QUERY, _engine

        eng = _engine(sf_tiny)
        eng.manifest.bm25_k1, eng.manifest.bm25_b = 1.2, 0.75
        s_a = eng.search_bm25(BM25_QUERY, 1, method="exhaustive")[0][1]
        eng.manifest.bm25_k1, eng.manifest.bm25_b = 2.0, 0.3
        s_b = eng.search_bm25(BM25_QUERY, 1, method="exhaustive")[0][1]
        assert abs(s_a - s_b) > 1e-9

    def test_manifest_mutation_does_not_leak(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import _engine, q_bm25_grid

        q_bm25_grid(sf_tiny)
        eng = _engine(sf_tiny)
        assert eng.manifest.bm25_k1 == 1.2 and eng.manifest.bm25_b == 0.75
