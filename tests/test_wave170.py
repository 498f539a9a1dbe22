"""Wave 170: sampled distinct estimators + geometric median — vs
direct recomputation and the estimators' defining properties."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestDistinctEstimators:
    def test_matches_direct_spectrum(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            DE_MOD,
            _md5_low64,
            q_distinct_estimators,
        )

        li = pd.read_parquet(
            f"{sf_tiny}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
        )
        keep = [
            _md5_low64(f"{o}#{l}#{p}#{s}") % DE_MOD == 0
            for o, l, p, s in zip(
                li["l_orderkey"], li["l_linenumber"], li["l_partkey"], li["l_suppkey"]
            )
        ]
        samp = li.loc[keep, "l_partkey"]
        fj = samp.value_counts().value_counts().to_dict()
        n = int(sum(j * f for j, f in fj.items()))
        d_s = int(sum(fj.values()))
        f1, f2 = fj.get(1, 0), fj.get(2, 0)
        N = len(li)
        exact = li["l_partkey"].nunique()
        got = q_distinct_estimators(sf_tiny).set_index("estimator")
        assert got["n_sampled"].iloc[0] == n
        assert got["d_sample"].iloc[0] == d_s
        assert got["exact_distinct"].iloc[0] == exact
        gee = math.sqrt(N / n) * f1 + sum(f for j, f in fj.items() if j >= 2)
        assert abs(got.loc["gee", "estimate"] - round(gee, 6)) < 1e-6
        if f2 > 0:
            chao = d_s + f1 * f1 / (2 * f2)
            assert abs(got.loc["chao", "estimate"] - round(chao, 6)) < 1e-6

    def test_estimates_bracket_truth_reasonably(self, ray_session, sf_small):
        from searchengine_ray.pipelines.queries import q_distinct_estimators

        got = q_distinct_estimators(sf_small)
        # every estimator ≥ observed distinct, and within 3× of truth
        assert (got["estimate"] >= got["d_sample"].iloc[0] - 1e-9).all()
        assert (got["estimate"] < 3 * got["exact_distinct"].iloc[0]).all()
        assert (got["estimate"] > got["exact_distinct"].iloc[0] / 3).all()


class TestGeometricMedian:
    def test_matches_direct_weiszfeld(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            GEOMED_ITERS,
            q_geometric_median,
            round_half_away,
        )

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["embedding"])
        M = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
        m = round_half_away(M.mean(axis=0), 10)
        for _ in range(GEOMED_ITERS):
            d = np.maximum(np.sqrt(((M - m) ** 2).sum(axis=1)), 1e-9)
            w = 1.0 / d
            m = round_half_away((M * w[:, None]).sum(axis=0) / w.sum(), 10)
        got = q_geometric_median(sf_tiny)
        assert np.allclose(got["median_val"], round_half_away(m, 6), atol=1e-9)
        d_fin = np.sqrt(((M - m) ** 2).sum(axis=1))
        micro = np.rint(round_half_away(d_fin, 6) * 1e6).astype(np.int64)
        assert got["objective_micro"].iloc[0] == int(micro.sum())

    def test_robustness_vs_mean(self, ray_session, sf_tiny):
        """The median's Σd objective beats the mean's (Weiszfeld
        descends), and perturbing one point moves the median less
        than the mean (robustness)."""
        from searchengine_ray.pipelines.queries import q_geometric_median

        got = q_geometric_median(sf_tiny)
        assert got["objective_micro"].iloc[0] <= got["mean_objective_micro"].iloc[0]

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["embedding"])
        M = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
        M2 = M.copy()
        M2[0] += 100.0  # corrupt one vector

        def weisz(X, iters=20):
            m = X.mean(axis=0)
            for _ in range(iters):
                d = np.maximum(np.sqrt(((X - m) ** 2).sum(axis=1)), 1e-9)
                w = 1.0 / d
                m = (X * w[:, None]).sum(axis=0) / w.sum()
            return m

        shift_mean = np.linalg.norm(M2.mean(axis=0) - M.mean(axis=0))
        shift_med = np.linalg.norm(weisz(M2) - weisz(M))
        assert shift_med < shift_mean
