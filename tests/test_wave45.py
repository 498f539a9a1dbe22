"""Brute-force identity tests for the A/B/n and capture-recapture wave
(registry 283-284)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestAbnTest:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import ABN_Z_BONF, q_abn_test

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id", "event_type"])
        ev = ev.assign(variant=(ev["user_id"] % 5).astype(int),
                       k=(ev["event_type"] == "purchase").astype(int))
        m = ev.groupby("variant")["k"].agg(["sum", "size"])
        k0, n0 = float(m.loc[0, "sum"]), float(m.loc[0, "size"])
        got = q_abn_test(sf_tiny).set_index("variant")
        assert list(got.index) == [1, 2, 3, 4]
        for v in range(1, 5):
            ki, ni = float(m.loc[v, "sum"]), float(m.loc[v, "size"])
            pool = (ki + k0) / (ni + n0)
            z = (ki / ni - k0 / n0) / math.sqrt(
                pool * (1 - pool) * (1 / ni + 1 / n0)
            )
            assert int(got.loc[v, "k"]) == int(ki)
            assert abs(got.loc[v, "z_vs_control"] - z) < 1e-6
            assert bool(got.loc[v, "significant"]) == (abs(z) > ABN_Z_BONF)


class TestCaptureRecapture:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import CUPED_SPLIT_DAY, q_capture_recapture

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id", "ts"])
        day = ev["ts"].astype("int64") // 86_400_000_000
        w1 = set(ev.loc[day < CUPED_SPLIT_DAY, "user_id"].astype(int))
        w2 = set(ev.loc[day >= CUPED_SPLIT_DAY, "user_id"].astype(int))
        got = q_capture_recapture(sf_tiny)
        assert int(got["n_window1"].iloc[0]) == len(w1)
        assert int(got["n_window2"].iloc[0]) == len(w2)
        assert int(got["overlap"].iloc[0]) == len(w1 & w2)
        assert int(got["true_distinct"].iloc[0]) == len(w1 | w2)
        est = len(w1) * len(w2) / len(w1 & w2)
        assert abs(got["estimate"].iloc[0] - est) < 1e-6
        # with near-complete overlap the estimate must bracket truth loosely
        assert got["estimate"].iloc[0] >= max(len(w1), len(w2)) - 1e-9
