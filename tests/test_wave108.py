"""Brute-force identity tests for the heuristics/cycle wave
(annealing + Floyd, registry 413-414)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestAnnealingAssign:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            _PM_MOD,
            _PM_MUL,
            ANNEAL_STEPS,
            ASSIGN_MOD,
            ASSIGN_N,
            q_annealing_assign,
        )

        sup = (
            pd.read_parquet(
                f"{sf_tiny}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
            )
            .sort_values("s_suppkey")
            .head(ASSIGN_N)
            .reset_index(drop=True)
        )
        n = len(sup)
        cents = (
            np.sign(sup["s_acctbal"].to_numpy())
            * np.floor(np.abs(np.round(sup["s_acctbal"].to_numpy(), 2) * 100) + 0.5)
        ).astype(np.int64)
        cost = (cents[:, None] + 137 * np.arange(n)[None, :]) % ASSIGN_MOD
        perm = list(range(n))
        cur = start = int(sum(cost[i, perm[i]] for i in range(n)))
        best, state, acc, accw = cur, 7, 0, 0
        for k in range(ANNEAL_STEPS):
            state = state * _PM_MUL % _PM_MOD
            i = state % n
            state = state * _PM_MUL % _PM_MOD
            j = state % n
            if i == j:
                continue
            delta = int(
                cost[i, perm[j]] + cost[j, perm[i]]
                - cost[i, perm[i]] - cost[j, perm[j]]
            )
            state = state * _PM_MUL % _PM_MOD
            if delta < 0 or (state % 997) * delta < max(0, 2000 - 10 * k):
                perm[i], perm[j] = perm[j], perm[i]
                cur += delta
                acc += 1
                accw += int(delta > 0)
                best = min(best, cur)
        got = q_annealing_assign(sf_tiny).iloc[0]
        assert got["start_cost"] == start
        assert got["best_cost"] == best
        assert got["final_cost"] == cur
        assert got["n_accepted"] == acc
        assert got["n_worse_accepted"] == accw

    def test_heuristic_vs_exact(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            q_annealing_assign,
            q_assignment_dp,
        )

        ann = q_annealing_assign(sf_tiny).iloc[0]
        opt = q_assignment_dp(sf_tiny)
        dp_opt = opt[opt["mask"] == -1].iloc[0]["dp_value"]
        assert ann["best_cost"] >= dp_opt
        assert ann["best_cost"] <= ann["start_cost"]


class TestFloydCycle:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            FLOYD_SEEDS,
            q_floyd_cycle,
        )

        n = len(
            pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        )

        def f(x):
            return (5 * x + 1) % n

        got = q_floyd_cycle(sf_tiny)
        for seed in FLOYD_SEEDS:
            # direct rho decomposition by visited-set walk
            seen = {}
            x, k = seed, 0
            while x not in seen:
                seen[x] = k
                x = f(x)
                k += 1
            mu = seen[x]
            lam = k - seen[x]
            row = got[got["seed"] == seed].iloc[0]
            assert row["mu"] == mu
            assert row["lam"] == lam
            # Floyd meeting round is a multiple-of-lambda offset fact:
            # meet >= mu and f^meet applied twice meets once
            assert row["meet_round"] >= 1

    def test_cycle_invariant(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_floyd_cycle

        n = len(
            pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        )
        got = q_floyd_cycle(sf_tiny)
        for _, r in got.iterrows():
            x = int(r["seed"])
            for _ in range(int(r["mu"])):
                x = (5 * x + 1) % n
            y = x
            for _ in range(int(r["lam"])):
                y = (5 * y + 1) % n
            assert x == y
