"""Wave 198: phi accrual + coupon collector — vs direct replay and
the k·H_k law."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestPhiAccrual:
    def test_matches_direct_gaps(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PHI_MIN_EVENTS,
            PHI_THRESHOLDS,
            q_phi_accrual,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "user_id"])
        ev["a"] = ev["ts"].astype("int64")
        stats = []
        for uid, g in ev.groupby("user_id"):
            if len(g) < PHI_MIN_EVENTS:
                continue
            gaps = np.diff(np.sort(g["a"].to_numpy(np.int64)))
            gaps = gaps[gaps > 0]
            if len(gaps):
                stats.append((len(gaps), int(gaps.sum()), int(gaps.max())))
        got = q_phi_accrual(sf_tiny).set_index("phi_threshold")
        ln10 = math.log(10)
        for th in PHI_THRESHOLDS:
            susp = sum(
                1 for n, s, mx in stats if mx * n > th * ln10 * s
            )
            assert got.loc[th, "n_users"] == len(stats)
            assert got.loc[th, "n_suspected"] == susp

    def test_threshold_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_phi_accrual

        got = q_phi_accrual(sf_tiny).sort_values("phi_threshold")
        s = got["n_suspected"].to_numpy()
        assert (np.diff(s) <= 0).all()  # higher φ → fewer suspects
        assert got["mean_phi_max_micro"].iloc[0] > 0


class TestCouponCollector:
    def test_matches_first_occurrence_max(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_coupon_collector

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        ev = ev.sort_values(["ts", "event_id"])
        K = ev["event_type"].nunique()
        draws = []
        complete = 0
        for uid, g in ev.groupby("user_id"):
            seen = {}
            for i, t in enumerate(g["event_type"], start=1):
                if t not in seen:
                    seen[t] = i
            if len(seen) == K:
                complete += 1
                draws.append(max(seen.values()))
        got = q_coupon_collector(sf_tiny)
        assert got["k_types"].iloc[0] == K
        assert got["n_complete"].iloc[0] == complete
        mean = sum(draws) / len(draws)
        assert abs(got["mean_draws_micro"].iloc[0] / 1e6 - mean) < 1e-5

    def test_theory_band(self, ray_session, sf_small):
        """Near-uniform event types ⇒ empirical mean within ~30% of
        k·H_k (finite-sample + mild skew slack)."""
        from searchengine_ray.pipelines.queries import q_coupon_collector

        got = q_coupon_collector(sf_small)
        emp = got["mean_draws_micro"].iloc[0] / 1e6
        theory = got["theory_micro"].iloc[0] / 1e6
        assert abs(emp - theory) / theory < 0.3
