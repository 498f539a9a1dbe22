"""Wave 155: Yannakakis semi-join reduction audit + Lindley queue
waiting-time replay — vs independent pandas/sequential brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestYannakakisReduce:
    def test_matches_pandas_plan(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            YANN_QTY,
            YANN_REGION,
            YANN_STATUS,
            q_yannakakis_reduce,
        )

        got = q_yannakakis_reduce(sf_tiny).set_index("relation")
        region = pd.read_parquet(f"{sf_tiny}/region.parquet")
        nation = pd.read_parquet(f"{sf_tiny}/nation.parquet")
        cust = pd.read_parquet(f"{sf_tiny}/customer.parquet")
        orders = pd.read_parquet(f"{sf_tiny}/orders.parquet")
        line = pd.read_parquet(f"{sf_tiny}/lineitem.parquet")

        rk = set(region[region["r_name"] == YANN_REGION]["r_regionkey"])
        nk = set(nation[nation["n_regionkey"].isin(rk)]["n_nationkey"])
        ck = set(cust[cust["c_nationkey"].isin(nk)]["c_custkey"])
        of = orders[orders["o_orderstatus"] == YANN_STATUS]
        ok = set(of[of["o_custkey"].isin(ck)]["o_orderkey"])
        lf = line[line["l_quantity"] > YANN_QTY]
        lred = lf[lf["l_orderkey"].isin(ok)]

        assert got.loc["customer", "reduced_rows"] == len(ck)
        assert got.loc["orders", "reduced_rows"] == len(ok)
        assert got.loc["lineitem", "reduced_rows"] == len(lred)
        assert got.loc["customer", "input_rows"] == len(cust)
        assert got.loc["orders", "input_rows"] == len(of)
        assert got.loc["lineitem", "input_rows"] == len(lf)
        rev = (lred["l_extendedprice"] * (1 - lred["l_discount"])).sum()
        assert abs(got.loc["lineitem", "final_revenue"] - round(rev, 2)) < 1e-6
        assert (got["final_rows"] == len(lred)).all()

    def test_reduction_is_strict(self, ray_session, sf_tiny):
        """The semi-join cascade must actually shrink the fact side
        (one region of five) — otherwise the audit is vacuous."""
        from searchengine_ray.pipelines.queries import q_yannakakis_reduce

        got = q_yannakakis_reduce(sf_tiny).set_index("relation")
        assert (
            got.loc["lineitem", "reduced_rows"] < got.loc["lineitem", "input_rows"]
        )
        assert got.loc["orders", "reduced_rows"] < got.loc["orders", "input_rows"]


class TestLindleyQueue:
    def _brute(self, sf_dir):
        from searchengine_ray.pipelines.queries import LINDLEY_SVC_US

        ev = pd.read_parquet(sf_dir + "/events.parquet", columns=["event_id", "ts", "user_id"])
        ev["a"] = ev["ts"].astype("int64")
        out = {}
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values(["a", "event_id"], kind="mergesort")
            a = g["a"].to_numpy(np.int64)
            s = (1 + g["event_id"].to_numpy(np.int64) % 7) * LINDLEY_SVC_US
            w = 0
            waits = []
            for i in range(len(g)):
                if i > 0:
                    w = max(0, w + int(s[i - 1]) - int(a[i] - a[i - 1]))
                waits.append(w)
            out[int(uid)] = (len(waits), int(sum(waits)), int(max(waits)))
        return out

    def test_matches_sequential_recursion(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_lindley_queue

        got = q_lindley_queue(sf_tiny)
        want = self._brute(sf_tiny)
        assert len(got) == len(want)
        for r in got.itertuples():
            n, tot, mx = want[int(r.user_id)]
            assert r.n_events == n
            assert r.total_wait_us == tot, r.user_id
            assert r.max_wait_us == mx, r.user_id

    def test_first_event_never_waits_and_nonneg(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_lindley_queue

        got = q_lindley_queue(sf_tiny)
        assert (got["max_wait_us"] >= 0).all()
        assert (got["total_wait_us"] >= 0).all()
        # a single-event user has zero wait
        singles = got[got["n_events"] == 1]
        if len(singles):
            assert (singles["total_wait_us"] == 0).all()
