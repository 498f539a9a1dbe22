"""Brute-force identity tests for the join-planning/balancing wave
(bushy join DP + two-choice balls, registry 401-402)."""

from __future__ import annotations

from itertools import product

import numpy as np
import pandas as pd


class TestBushyJoinDp:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BUSHY_MOD,
            BUSHY_TABLES,
            q_bushy_join_dp,
        )

        counts = [
            len(pd.read_parquet(f"{sf_tiny}/{t}.parquet"))
            for t in BUSHY_TABLES
        ]
        n = len(counts)
        d = [c % BUSHY_MOD + 2 for c in counts] + [counts[-1] % BUSHY_MOD + 3]
        dp = [[0] * n for _ in range(n)]
        sp = [[-1] * n for _ in range(n)]
        for ln in range(2, n + 1):
            for i in range(0, n - ln + 1):
                j = i + ln - 1
                best, bk = 1 << 60, -1
                for k in range(i, j):
                    c = dp[i][k] + dp[k + 1][j] + d[i] * d[k + 1] * d[j + 1]
                    if c < best:
                        best, bk = c, k
                dp[i][j], sp[i][j] = best, bk
        got = q_bushy_join_dp(sf_tiny)
        for _, r in got.iterrows():
            i = BUSHY_TABLES.index(r["rel_from"])
            j = BUSHY_TABLES.index(r["rel_to"])
            assert r["min_cost"] == dp[i][j]
            assert r["split_at"] == BUSHY_TABLES[sp[i][j]]

    def test_dp_beats_any_fixed_paren(self, ray_session, sf_tiny):
        """The full-chain optimum is <= pure left-deep and pure
        right-deep costs."""
        from searchengine_ray.pipelines.queries import (
            BUSHY_MOD,
            BUSHY_TABLES,
            q_bushy_join_dp,
        )

        counts = [
            len(pd.read_parquet(f"{sf_tiny}/{t}.parquet"))
            for t in BUSHY_TABLES
        ]
        n = len(counts)
        d = [c % BUSHY_MOD + 2 for c in counts] + [counts[-1] % BUSHY_MOD + 3]
        left = sum(d[0] * d[k + 1] * d[k + 2] for k in range(n - 1))
        right = sum(d[k] * d[k + 1] * d[n] for k in range(n - 2, -1, -1))
        got = q_bushy_join_dp(sf_tiny)
        full = got[
            (got["rel_from"] == BUSHY_TABLES[0])
            & (got["rel_to"] == BUSHY_TABLES[-1])
        ].iloc[0]["min_cost"]
        assert full <= left
        assert full <= right


class TestTwoChoiceBalls:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            TC_BINS,
            TC_STRIDE,
            _md5_low64,
            q_two_choice_balls,
        )

        ids = (
            pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])[
                "doc_id"
            ]
            .astype(int)
            .sort_values()
        )
        loads = np.zeros(TC_BINS, np.int64)
        single = np.zeros(TC_BINS, np.int64)
        for d in ids:
            if d % TC_STRIDE:
                continue
            h1 = _md5_low64(f"a{d}") % TC_BINS
            h2 = _md5_low64(f"b{d}") % TC_BINS
            pick = h1 if loads[h1] <= loads[h2] else h2
            loads[pick] += 1
            single[h1] += 1
        got = q_two_choice_balls(sf_tiny)
        assert got["load_two_choice"].tolist() == loads.tolist()
        assert got["load_single"].tolist() == single.tolist()

    def test_two_choices_flatten_load(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_two_choice_balls

        got = q_two_choice_balls(sf_tiny)
        assert got["load_two_choice"].sum() == got["load_single"].sum()
        # the Mitzenmacher effect: the max collapses
        assert got["load_two_choice"].max() <= got["load_single"].max()
        assert (
            got["load_two_choice"].max() - got["load_two_choice"].min()
            <= got["load_single"].max() - got["load_single"].min() + 1
        )
