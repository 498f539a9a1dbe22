"""Brute-force identity tests for the random-projection / fixed-effects
/ McNemar wave (registry 273-275)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestRandomProjection:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import RP_DIM, RP_SEED, q_random_projection

        t = pd.read_parquet(f"{sf_tiny}/embeddings.parquet").sort_values("vec_id")
        X = np.stack([np.asarray(v, np.float64) for v in t["embedding"]])
        R = np.random.default_rng(RP_SEED).standard_normal((RP_DIM, 64)) / np.sqrt(RP_DIM)
        P = X @ R.T
        d64 = np.sqrt(((X[:-1] - X[1:]) ** 2).sum(axis=1))
        d16 = np.sqrt(((P[:-1] - P[1:]) ** 2).sum(axis=1))
        dist = np.abs(d16 / d64 - 1.0)
        got = q_random_projection(sf_tiny)
        assert int(got["n_pairs"].iloc[0]) == len(X) - 1
        assert abs(got["mean_distortion"].iloc[0] - dist.mean()) < 1e-6
        assert abs(got["max_distortion"].iloc[0] - dist.max()) < 1e-6
        # JL sanity: 16-dim projection of 64-dim data stays within ~60%
        assert got["max_distortion"].iloc[0] < 0.6


class TestFixedEffects:
    def test_matches_demeaned_ols(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_fixed_effects

        o = pd.read_parquet(f"{sf_tiny}/orders.parquet", columns=["o_custkey"])
        cnt = o.groupby("o_custkey").size()
        c = pd.read_parquet(
            f"{sf_tiny}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
        bal = np.round(c["c_acctbal"].to_numpy(np.float64), 2)
        c = c.assign(
            x=c["c_custkey"].map(cnt).fillna(0).astype(float),
            y=(np.floor(np.abs(bal * 100) + 0.5) * np.sign(bal * 100)),
        )
        # explicit within-transformation
        c["xd"] = c["x"] - c.groupby("c_nationkey")["x"].transform("mean")
        c["yd"] = c["y"] - c.groupby("c_nationkey")["y"].transform("mean")
        fe = (c["xd"] * c["yd"]).sum() / (c["xd"] ** 2).sum()
        got = q_fixed_effects(sf_tiny)
        assert abs(got["fe_slope"].iloc[0] - fe) < 1e-4
        assert int(got["n_groups"].iloc[0]) == c["c_nationkey"].nunique()


class TestMcnemar:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            q_decision_stump,
            q_mcnemar_test,
        )

        stump = q_decision_stump(sf_tiny)
        pol, thr = int(stump["polarity"].iloc[0]), int(stump["threshold"].iloc[0])
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["n_chars", "lang"])
        y = (docs["lang"] == "en").to_numpy()
        v = docs["n_chars"].to_numpy(np.int64)
        pred_s = (v <= thr) if pol == 0 else (v > thr)
        maj = y.mean() >= 0.5
        pred_m = np.full(len(v), maj)
        b = int(((pred_s == y) & (pred_m != y)).sum())
        cc = int(((pred_s != y) & (pred_m == y)).sum())
        chi2 = (abs(b - cc) - 1.0) ** 2 / (b + cc) if b + cc else 0.0
        got = q_mcnemar_test(sf_tiny)
        assert int(got["stump_only_right"].iloc[0]) == b
        assert int(got["baseline_only_right"].iloc[0]) == cc
        assert abs(got["mcnemar_chi2"].iloc[0] - chi2) < 1e-6
