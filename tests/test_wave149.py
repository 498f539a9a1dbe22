"""Brute-force identity tests for the experiment-planning / caching
wave (A/B power, TTL tuning; registry 495-496)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


class TestAbPower:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            AB_Z_ALPHA,
            AB_Z_BETA,
            q_ab_power,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["ts", "user_id", "event_type"]
        )
        p = (ev["event_type"] == "click").mean()
        users = sorted(set(int(u) for u in ev["user_id"]))
        n0 = sum(
            1
            for u in users
            if int.from_bytes(hashlib.md5(str(u).encode()).digest()[8:], "little") % 2
            == 0
        )
        days = (ev["ts"].astype("datetime64[s]").astype("int64") // 86400).nunique()
        z = AB_Z_ALPHA + AB_Z_BETA
        mde = z * np.sqrt(2 * p * (1 - p) / n0)
        n_needed = 2 * p * (1 - p) * (z / (0.02 * p)) ** 2
        got = q_ab_power(sf_tiny).iloc[0]
        assert abs(got["baseline_ctr"] - p) < 1e-6
        assert got["n_per_arm"] == n0
        assert abs(got["mde_abs"] - mde) < 1e-6
        assert abs(got["n_needed_2pct"] - n_needed) < 1e-2
        assert abs(got["days_needed_2pct"] - n_needed * 2 / (len(users) / days)) < 1e-2

    def test_power_math_sane(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ab_power

        got = q_ab_power(sf_tiny).iloc[0]
        assert 0 < got["baseline_ctr"] < 1
        assert got["mde_abs"] > 0
        # a +2% relative lift needs more users than a tiny test corpus has
        assert got["n_needed_2pct"] > got["n_per_arm"]


class TestTtlTuning:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import TTL_GRID_H, q_ttl_tuning

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet",
            columns=["ts", "user_id", "event_id", "event_type"],
        )
        ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
        gaps = []
        for _, g in ev.groupby(["user_id", "event_type"]):
            t = g.sort_values(["t", "event_id"])["t"].to_numpy(np.int64)
            gaps.extend(np.diff(t))
        gaps = np.asarray(gaps, np.int64)
        got = q_ttl_tuning(sf_tiny)
        med = int(np.sort(gaps // 1_000_000)[-(-len(gaps) // 2) - 1])
        for h, (_, r) in zip(TTL_GRID_H, got.iterrows()):
            hits = int((gaps <= h * 3_600_000_000).sum())
            assert (r["ttl_hours"], r["reaccesses"], r["hits"]) == (
                h,
                len(gaps),
                hits,
            )
            assert r["median_gap_s"] == med

    def test_hit_rate_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ttl_tuning

        got = q_ttl_tuning(sf_tiny)
        assert got["hit_rate"].is_monotonic_increasing
        assert (got["hits"] <= got["reaccesses"]).all()
