"""Brute-force identity tests for the SPRT/seasonal wave
(registry 311-312)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


class TestSprtTest:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SPRT_LIFT,
            SPRT_LN_A,
            SPRT_LN_B,
            q_sprt_test,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["ts", "user_id", "event_type"]
        )
        ev["day"] = (
            ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        ).astype(int)
        ev["arm"] = (ev["user_id"] % 2).astype(int)
        ev["k"] = (ev["event_type"] == "purchase").astype(int)
        ctl = ev[ev["arm"] == 0]
        p0 = ctl["k"].sum() / len(ctl)
        p1 = SPRT_LIFT * p0
        lw, ll = math.log(p1 / p0), math.log((1 - p1) / (1 - p0))
        trt = (
            ev[ev["arm"] == 1]
            .groupby("day")
            .agg(n=("k", "size"), k=("k", "sum"))
            .sort_index()
        )
        inc = np.round(
            (trt["k"].to_numpy() * lw + (trt["n"] - trt["k"]).to_numpy() * ll)
            * 1e6
        ).astype(np.int64)
        walk = np.cumsum(inc)
        hi, lo = round(SPRT_LN_A * 1e6), round(SPRT_LN_B * 1e6)
        cross = np.flatnonzero((walk >= hi) | (walk <= lo))
        got = q_sprt_test(sf_tiny)
        assert got["n_days"].iloc[0] == len(trt)
        assert got["p0"].iloc[0] == pytest.approx(p0, abs=1e-6)
        assert got["final_llr"].iloc[0] == pytest.approx(walk[-1] / 1e6, abs=1e-9)
        if len(cross):
            want = "accept_h1" if walk[cross[0]] >= hi else "accept_h0"
            assert got["decision"].iloc[0] == want
            assert got["decision_day"].iloc[0] == int(trt.index[cross[0]])
        else:
            assert got["decision"].iloc[0] == "continue"
            assert got["decision_day"].iloc[0] == -1

    def test_decision_consistent_with_walk(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_sprt_test

        got = q_sprt_test(sf_tiny)
        assert got["decision"].iloc[0] in {"accept_h1", "accept_h0", "continue"}
        assert 0.0 < got["p0"].iloc[0] < 1.0


class TestSeasonalDecompose:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_seasonal_decompose

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts"])
        day = (
            ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        ).astype(int)
        daily = day.value_counts().sort_index()
        days = daily.index.to_numpy(np.int64)
        c = daily.to_numpy(np.int64)
        got = q_seasonal_decompose(sf_tiny).set_index("dow")
        for w in range(7):
            vals, raws = [], []
            for i in range(3, len(c) - 3):
                if days[i] % 7 != w:
                    continue
                trend = c[i - 3 : i + 4].sum() / 7.0
                vals.append(round((c[i] - trend) * 1e6))
                raws.append(c[i])
            row = got.loc[w]
            assert row["n_days"] == len(vals)
            if vals:
                assert row["seasonal"] == pytest.approx(
                    sum(vals) / 1e6 / len(vals), abs=1e-6
                )
                assert row["mean_count"] == pytest.approx(
                    sum(raws) / len(raws), abs=1e-6
                )

    def test_seasonal_sums_near_zero(self, ray_session, sf_tiny):
        # additive decomposition: weighted seasonal indices ≈ 0 overall
        from searchengine_ray.pipelines.queries import q_seasonal_decompose

        got = q_seasonal_decompose(sf_tiny)
        total = (got["seasonal"] * got["n_days"]).sum()
        scale = (got["mean_count"] * got["n_days"]).sum()
        assert abs(total) < 0.05 * max(scale, 1.0)
