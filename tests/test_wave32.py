"""Brute-force identity tests for the range-partition sort and
late-arrival watermark wave (registry 252-253)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestRangePartitionSort:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SORT_PARTITIONS, q_range_partition_sort

        o = pd.read_parquet(f"{sf_tiny}/orders.parquet", columns=["o_totalprice"])
        p = np.round(o["o_totalprice"].to_numpy(np.float64), 2)
        cents = (np.floor(np.abs(p * 100) + 0.5) * np.sign(p * 100)).astype(np.int64)
        sv = np.sort(cents)
        n = len(sv)
        ranks = [(i * n) // SORT_PARTITIONS for i in range(1, SORT_PARTITIONS)]
        # smallest value whose cumulative count >= rank
        uniq = np.unique(sv)
        cum = np.searchsorted(sv, uniq, side="right")
        cuts = uniq[np.searchsorted(cum, ranks, side="left")]
        pid = np.searchsorted(cuts, cents, side="right")
        got = q_range_partition_sort(sf_tiny)
        for r in got.itertuples():
            m = pid == r.pid
            assert int(r.n_rows) == int(m.sum())
            assert int(r.cents_min) == int(cents[m].min())
            assert int(r.cents_max) == int(cents[m].max())
        # disjoint ranges => concatenation is the global sort
        mins = got["cents_min"].to_numpy()
        maxs = got["cents_max"].to_numpy()
        assert (maxs[:-1] < mins[1:]).all()
        assert int(got["n_rows"].sum()) == n

    def test_partitions_are_balanced(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SORT_PARTITIONS, q_range_partition_sort

        got = q_range_partition_sort(sf_tiny)
        n = got["n_rows"].sum()
        # exact-quantile cuts keep every partition within 3x of ideal
        assert (got["n_rows"] <= 3 * (n // SORT_PARTITIONS) + 1).all()


class TestLateEvents:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import LATE_GRACE_US, q_late_events

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        ev = ev.sort_values(["user_id", "event_id"]).reset_index(drop=True)
        rows = []
        for _, g in ev.groupby("user_id", sort=False):
            hwm = None
            for r in g.itertuples():
                ts = int(pd.Timestamp(r.ts).value // 1000)
                late_by = max(hwm - ts, 0) if hwm is not None else 0
                rows.append((r.event_type, late_by))
                hwm = ts if hwm is None else max(hwm, ts)
        df = pd.DataFrame(rows, columns=["event_type", "late_by"])
        got = q_late_events(sf_tiny).set_index("event_type")
        for et, g in df.groupby("event_type"):
            assert int(got.loc[et, "n_events"]) == len(g)
            assert int(got.loc[et, "n_late"]) == int((g["late_by"] > LATE_GRACE_US).sum())
            assert int(got.loc[et, "worst_lateness_us"]) == int(g["late_by"].max())
