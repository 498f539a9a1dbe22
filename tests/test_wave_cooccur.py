"""Brute-force identity tests for the co-occurrence / doc-cosine /
survival / dense-topk / df-histogram wave (registry 162-166)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest








class TestDenseTopk:
    def test_matches_window_function(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_dense_topk

        cust = pd.read_parquet(
            f"{sf_tiny}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
        cust["bal"] = cust["c_acctbal"].round(0)
        expect = []
        for nk, g in cust.groupby("c_nationkey"):
            top2 = np.sort(g["bal"].unique())[::-1][:2]
            for rnk, v in enumerate(top2, 1):
                for ck in sorted(g.loc[g["bal"] == v, "c_custkey"]):
                    expect.append((int(nk), int(ck), float(v), rnk))
        expect.sort()
        got = q_dense_topk(sf_tiny)
        got_rows = sorted(
            zip(
                got["c_nationkey"].astype(int),
                got["c_custkey"].astype(int),
                got["bal"].astype(float),
                got["rnk"].astype(int),
            )
        )
        assert got_rows == expect

    def test_ties_all_surface(self, ray_session, sf_tiny):
        """dense_rank keeps every row at a tied value — per (nation, rnk)
        group the balances are constant and ranks are only 1 or 2."""
        from searchengine_ray.pipelines.queries import q_dense_topk

        got = q_dense_topk(sf_tiny)
        assert set(got["rnk"]) <= {1, 2}
        for (_, _), g in got.groupby(["c_nationkey", "rnk"]):
            assert g["bal"].nunique() == 1










