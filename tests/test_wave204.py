"""Wave 204: jump consistent hash + leaky bucket — vs reference
implementation and shaping semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestJumpHash:
    def test_reference_properties(self):
        from searchengine_ray.pipelines.queries import _jump_hash

        # single bucket: everything lands in 0
        for k in (0, 1, 123456789, (1 << 63) + 5):
            assert _jump_hash(k, 1) == 0
        # monotone consistency: growing n only moves keys INTO new buckets
        rng = np.random.RandomState(4)
        keys = [int(x) for x in rng.randint(0, 1 << 62, 300)]
        for n in range(2, 20):
            for k in keys[:50]:
                b_prev = _jump_hash(k, n - 1)
                b_new = _jump_hash(k, n)
                assert b_new == b_prev or b_new == n - 1

    def test_balance_and_movement(self, ray_session, sf_small):
        from searchengine_ray.pipelines.queries import (
            JUMP_N1,
            JUMP_N2,
            q_jump_hash,
        )

        got = q_jump_hash(sf_small)
        n = got["n_total"].iloc[0]
        # near-perfect balance: each bucket within ±40% of n/16
        exp = n / JUMP_N1
        assert (got["n_keys"] > 0.5 * exp).all()
        assert (got["n_keys"] < 1.8 * exp).all()
        # movement ≈ 1/17 of keys (binomial noise at n=500 keys → wide)
        frac = got["total_moved"].iloc[0] / n
        assert abs(frac - 1 / JUMP_N2) < 0.025


class TestLeakyBucket:
    def test_matches_sequential_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            LEAK_CAP_MICRO,
            LEAK_PER_S_MICRO,
            q_leaky_bucket,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        ev["a"] = ev["ts"].astype("int64")
        want = {}
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values(["a", "event_id"])
            level = 0
            prev = int(g["a"].iloc[0])
            for ts, t in zip(g["a"], g["event_type"]):
                drain = (int(ts) - prev) * LEAK_PER_S_MICRO // 1_000_000
                level = max(0, level - drain)
                prev = int(ts)
                conform = level < LEAK_CAP_MICRO
                if conform:
                    level += 1_000_000
                c, d = want.get(t, (0, 0))
                want[t] = (c + conform, d + (not conform))
        got = q_leaky_bucket(sf_tiny)
        for r in got.itertuples():
            assert (r.n_conforming, r.n_dropped) == want[r.event_type]

    def test_shaping_behaviour(self, ray_session, sf_small):
        """A 0.05 req/s drain against ~multi-per-hour users must drop
        a real share of the burst traffic but never everything."""
        from searchengine_ray.pipelines.queries import q_leaky_bucket

        got = q_leaky_bucket(sf_small)
        total = (got["n_conforming"] + got["n_dropped"]).sum()
        dropped = got["n_dropped"].sum()
        assert 0 < dropped < total
        assert got["n_conforming"].sum() > 0
