"""Brute-force identity tests for the CUPED and LRU-replay wave
(registry 254-255)."""

from __future__ import annotations

from collections import OrderedDict

import json

import numpy as np
import pandas as pd


def _milli(v: np.ndarray) -> np.ndarray:
    r = np.round(v, 3) * 1e3
    return (np.floor(np.abs(r) + 0.5) * np.sign(r)).astype(np.int64)


class TestCuped:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import CUPED_SPLIT_DAY, q_cuped_adjust

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id", "ts", "value"])
        day = ev["ts"].astype("int64") // 86_400_000_000
        ev = ev.assign(milli=_milli(ev["value"].to_numpy(np.float64)), pre=day < CUPED_SPLIT_DAY)
        pu = ev.groupby("user_id").apply(
            lambda d: pd.Series(
                {
                    "x": int(d.loc[d["pre"], "milli"].sum()),
                    "y": int(d.loc[~d["pre"], "milli"].sum()),
                }
            ),
            include_groups=False,
        ).reset_index()
        x = pu["x"].to_numpy(np.float64)
        y = pu["y"].to_numpy(np.float64)
        theta = np.cov(x, y, bias=True)[0, 1] / x.var()
        got = q_cuped_adjust(sf_tiny)
        assert abs(got["theta"].iloc[0] - theta) < 1e-4
        for v in (0, 1):
            sel = (pu["user_id"] % 2 == v).to_numpy()
            row = got[got["variant"] == v].iloc[0]
            assert int(row["n_users"]) == int(sel.sum())
            assert abs(row["mean_post_milli"] - y[sel].mean()) < 1e-4
            adj = y[sel].mean() - theta * (x[sel].mean() - x.mean())
            assert abs(row["mean_adj_milli"] - adj) < 1e-4
        # CUPED must not inflate variance
        assert got["var_reduction"].iloc[0] <= 1.0 + 1e-9

    def test_adjustment_preserves_pooled_mean(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cuped_adjust

        got = q_cuped_adjust(sf_tiny)
        n = got["n_users"].to_numpy(np.float64)
        raw = float((got["mean_post_milli"] * n).sum() / n.sum())
        adj = float((got["mean_adj_milli"] * n).sum() / n.sum())
        assert abs(raw - adj) < 1e-3


class TestLruHitRatio:
    def test_matches_sequential_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import LRU_CAPACITY, q_lru_hit_ratio

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet",
            columns=["event_id", "ts", "user_id", "props"],
        ).sort_values(["user_id", "ts", "event_id"])
        cold = cap = hit = 0
        for _, g in ev.groupby("user_id", sort=False):
            cache: OrderedDict = OrderedDict()
            seen: set = set()
            for p in g["props"]:
                item = json.loads(p)["k"]
                if item in cache:
                    cache.move_to_end(item)
                    hit += 1
                else:
                    if item in seen:
                        cap += 1
                    else:
                        cold += 1
                        seen.add(item)
                    cache[item] = True
                    if len(cache) > LRU_CAPACITY:
                        cache.popitem(last=False)
        got = q_lru_hit_ratio(sf_tiny)
        assert int(got["cold_misses"].iloc[0]) == cold
        assert int(got["capacity_misses"].iloc[0]) == cap
        assert int(got["hits"].iloc[0]) == hit
        assert int(got["n_accesses"].iloc[0]) == cold + cap + hit
