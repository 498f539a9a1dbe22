"""Brute-force identity tests for the experimentation wave
(IPS counterfactual CTR, sample-ratio mismatch; registry 493-494)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


class TestIpsCtr:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ips_ctr, q_position_bias

        bias = q_position_bias(sf_tiny)
        clicks = bias["clicks"].to_numpy(float)
        imps = bias["impressions"].to_numpy(float)
        ctr = clicks / imps
        exam = ctr / ctr[0]
        ips = np.where(clicks > 0, clicks / np.where(exam > 0, exam, 1), 0.0)
        got = q_ips_ctr(sf_tiny)
        assert np.allclose(got["ips_clicks"], ips, atol=1e-5)
        assert abs(got["naive_ctr_total"].iloc[0] - clicks.sum() / imps.sum()) < 1e-6
        assert abs(got["ips_ctr_total"].iloc[0] - ips.sum() / imps.sum()) < 1e-6

    def test_debiasing_consistent(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ips_ctr

        got = q_ips_ctr(sf_tiny)
        # position 1 is the propensity anchor: IPS leaves it unchanged
        assert abs(got["ips_clicks"].iloc[0] - got["clicks"].iloc[0]) < 1e-6
        # ips · exam reconstructs the raw clicks wherever clicks exist
        mask = got["clicks"] > 0
        recon = got[mask]["ips_clicks"] * got[mask]["exam_ratio"]
        assert np.allclose(recon, got[mask]["clicks"], rtol=1e-4)


class TestSrmCheck:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SRM_MOD, q_srm_check

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id"])
        users = sorted(set(int(u) for u in ev["user_id"]))
        arms = [
            int.from_bytes(hashlib.md5(str(u).encode()).digest()[8:], "little")
            % SRM_MOD
            for u in users
        ]
        n = len(users)
        exp = n / SRM_MOD
        obs = [arms.count(a) for a in range(SRM_MOD)]
        chi2 = sum((o - exp) ** 2 / exp for o in obs)
        z = abs((obs[0] - exp) / np.sqrt(n * 0.25))
        got = q_srm_check(sf_tiny)
        assert list(got["users"]) == obs
        assert abs(got["chi2"].iloc[0] - chi2) < 1e-6
        assert abs(got["abs_z"].iloc[0] - z) < 1e-6
        assert (got["srm_flag"] == int(z > 3)).all()

    def test_arms_partition_users(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_srm_check

        got = q_srm_check(sf_tiny)
        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id"])
        assert got["users"].sum() == ev["user_id"].nunique()
