"""Wave 171: Otsu threshold + auction assignment — vs brute force
(exhaustive threshold scan / 8! permutations)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd


class TestOtsuThreshold:
    def test_matches_float_otsu(self, ray_session, sf_tiny):
        """The integer-scored argmax must agree with the textbook
        float between-class-variance argmax."""
        from searchengine_ray.pipelines.queries import q_otsu_threshold

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["value"])
        c = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        vals = np.sort(np.unique(c))
        n = len(c)
        mu = c.mean()
        best = (-1.0, None)
        for t in vals[:-1]:
            m = c <= t
            w0 = m.mean()
            w1 = 1 - w0
            var_b = w0 * w1 * (c[m].mean() - c[~m].mean()) ** 2
            if var_b > best[0]:
                best = (var_b, int(t))
        got = q_otsu_threshold(sf_tiny)
        assert got["threshold_cents"].iloc[0] == best[1]
        assert got["n_low"].iloc[0] + got["n_high"].iloc[0] == n
        assert (
            got["sum_low"].iloc[0] + got["sum_high"].iloc[0] == int(c.sum())
        )

    def test_split_separates_means(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_otsu_threshold

        got = q_otsu_threshold(sf_tiny)
        assert got["mean_low_micro"].iloc[0] < got["mean_high_micro"].iloc[0]


class TestAuctionAssignment:
    def test_optimal_by_exhaustion(self, ray_session, sf_tiny):
        """ε=1 at ×(n+1) scaling guarantees the auction finds THE
        optimal assignment — verified against all 8! permutations."""
        from searchengine_ray.pipelines.queries import (
            AUCTION_N,
            _md5_low64,
            q_auction_assignment,
        )

        sup = np.sort(
            pd.read_parquet(f"{sf_tiny}/supplier.parquet", columns=["s_suppkey"])[
                "s_suppkey"
            ].to_numpy(np.int64)
        )[:AUCTION_N]
        cus = np.sort(
            pd.read_parquet(f"{sf_tiny}/customer.parquet", columns=["c_custkey"])[
                "c_custkey"
            ].to_numpy(np.int64)
        )[:AUCTION_N]
        v = np.array(
            [[_md5_low64(f"{sk}#{ck}") % 1000 for ck in cus] for sk in sup], np.int64
        )
        best = max(
            sum(int(v[p, j]) for j, p in enumerate(perm))
            for perm in itertools.permutations(range(AUCTION_N))
        )
        got = q_auction_assignment(sf_tiny)
        assert got["total_value"].iloc[0] == best
        # a valid perfect matching
        assert sorted(got["person"]) == list(range(1, AUCTION_N + 1))
        assert sorted(got["obj"]) == list(range(1, AUCTION_N + 1))
        # rows' values consistent with the matrix
        for r in got.itertuples():
            assert r.value == v[r.person - 1, r.obj - 1]

    def test_epsilon_complementary_slackness(self, ray_session, sf_tiny):
        """At termination every person's assigned net value is within
        ε·n of their best net value (ε-CS — the auction invariant)."""
        from searchengine_ray.pipelines.queries import (
            AUCTION_N,
            _md5_low64,
            q_auction_assignment,
        )

        got = q_auction_assignment(sf_tiny)
        sup = dict(zip(got["person"], got["s_suppkey"]))
        cus = dict(zip(got["obj"], got["c_custkey"]))
        p = dict(zip(got["obj"], got["price_scaled"]))
        n = AUCTION_N
        for r in got.itertuples():
            nets = [
                (_md5_low64(f"{sup[r.person]}#{cus[j]}") % 1000) * (n + 1) - p[j]
                for j in range(1, n + 1)
            ]
            own_net = (
                (_md5_low64(f"{sup[r.person]}#{cus[r.obj]}") % 1000) * (n + 1)
                - p[r.obj]
            )
            assert own_net >= max(nets) - n  # ε·n slack with ε=1
