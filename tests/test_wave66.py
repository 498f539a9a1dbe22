"""Brute-force identity tests for the v-optimal/join-order wave
(registry 329-330)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest


def _daily_counts(sf_dir: str):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    day = (
        ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    ).astype(int)
    s = day.value_counts().sort_index()
    return s.index.to_numpy(np.int64), s.to_numpy(np.int64)


class TestVoptimalHist:
    def test_matches_exhaustive(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import VOPT_K, q_voptimal_hist

        day, x = _daily_counts(sf_tiny)
        D = len(x)

        def sse_q(lo, hi):  # 1-based inclusive, micro-int
            seg = x[lo - 1 : hi].astype(np.float64)
            a, b = int(seg.sum()), int((seg * seg).sum())
            return round((float(b) - float(a * a) / len(seg)) * 1e6)

        best_cost, best_bounds = None, None
        for e1, e2, e3 in itertools.combinations(range(1, D), VOPT_K - 1):
            cost = (
                sse_q(1, e1)
                + sse_q(e1 + 1, e2)
                + sse_q(e2 + 1, e3)
                + sse_q(e3 + 1, D)
            )
            if best_cost is None or cost < best_cost:
                best_cost, best_bounds = cost, (e1, e2, e3)
        got = q_voptimal_hist(sf_tiny)
        total = round(got["sse"].sum() * 1e6)
        assert total == pytest.approx(best_cost, abs=4)  # 4 rounded segs
        e1, e2, e3 = best_bounds
        spans = [(1, e1), (e1 + 1, e2), (e2 + 1, e3), (e3 + 1, D)]
        for (lo, hi), row in zip(spans, got.itertuples()):
            assert row.day_lo == day[lo - 1]
            assert row.day_hi == day[hi - 1]
            assert row.n_days == hi - lo + 1

    def test_partition_covers_series(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_voptimal_hist

        day, x = _daily_counts(sf_tiny)
        got = q_voptimal_hist(sf_tiny)
        assert got["n_days"].sum() == len(x)
        assert got["day_lo"].iloc[0] == day[0]
        assert got["day_hi"].iloc[-1] == day[-1]
        assert (got["sse"] >= 0).all()


class TestJoinOrderDp:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_join_order_dp

        cust = pd.read_parquet(f"{sf_tiny}/customer.parquet", columns=["c_custkey"])
        orders = pd.read_parquet(
            f"{sf_tiny}/orders.parquet", columns=["o_custkey", "o_orderkey"]
        )
        li = pd.read_parquet(f"{sf_tiny}/lineitem.parquet", columns=["l_orderkey"])
        nc, dc = len(cust), cust["c_custkey"].nunique()
        no, dock = len(orders), orders["o_custkey"].nunique()
        dook = orders["o_orderkey"].nunique()
        nl, dl = len(li), li["l_orderkey"].nunique()
        co = nc * no / max(dc, dock)
        ol = no * nl / max(dook, dl)
        cl = float(nc) * nl
        fin = nc * no / max(dc, dock) * nl / max(dook, dl)
        first = {
            "COL": co, "OCL": co, "CLO": cl, "LCO": cl, "OLC": ol, "LOC": ol,
        }
        want = sorted(
            ((p, f, f + fin) for p, f in first.items()),
            key=lambda r: (r[2], r[0]),
        )
        got = q_join_order_dp(sf_tiny)
        for i, ((p, f, c), row) in enumerate(zip(want, got.itertuples()), 1):
            assert row.plan == p
            assert row.first_est == pytest.approx(f, rel=1e-9)
            assert row.total_cost == pytest.approx(c, rel=1e-9)
            assert row.rank == i

    def test_cross_products_rank_last(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_join_order_dp

        got = q_join_order_dp(sf_tiny)
        # Cartesian-first plans must be the two most expensive
        worst = set(got.sort_values("rank").tail(2)["plan"])
        assert worst == {"CLO", "LCO"}
