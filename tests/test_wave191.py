"""Wave 191: STR R-tree + multiset polynomial check — vs direct
packing replay and algebraic guarantees."""

from __future__ import annotations

import functools
import math

import numpy as np
import pandas as pd


class TestStrRtree:
    def test_matches_direct_packing(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import STR_LEAF, q_str_rtree

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_id", "value"])
        ev["x"] = ev["ts"].astype("int64")
        ev["x"] = (ev["x"] - ev["x"].min()) // 1_000_000
        ev["y"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        ev = ev.sort_values(["x", "y", "event_id"]).reset_index(drop=True)
        n = len(ev)
        n_leaves = -(-n // STR_LEAF)
        S = int(math.ceil(math.sqrt(n_leaves)))
        slice_sz = -(-n // S)
        ev["slice"] = np.arange(n) // slice_sz
        got = q_str_rtree(sf_tiny).set_index("slice")
        tot_area = 0
        for sl, g in ev.groupby("slice"):
            g = g.sort_values(["y", "x", "event_id"]).reset_index(drop=True)
            g["leaf"] = np.arange(len(g)) // STR_LEAF
            m = g.groupby("leaf").agg(
                x1=("x", "min"), x2=("x", "max"), y1=("y", "min"), y2=("y", "max")
            )
            area = int(((m["x2"] - m["x1"]) * (m["y2"] - m["y1"])).sum())
            assert got.loc[sl, "n_leaves"] == len(m)
            assert got.loc[sl, "sum_area"] == area
            tot_area += area
        assert got["total_area"].iloc[0] == tot_area

    def test_packing_quality(self, ray_session, sf_tiny):
        """STR leaves within a slice are y-disjoint up to boundary
        duplicates — overlap pairs should be a tiny fraction of all
        pairs."""
        from searchengine_ray.pipelines.queries import q_str_rtree

        got = q_str_rtree(sf_tiny)
        L = got["total_leaves"].iloc[0]
        assert got["total_overlaps"].iloc[0] <= max(L, 1)


class TestMultisetCheck:
    def test_matches_direct_product(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            MSC_P,
            _md5_low64,
            q_multiset_check,
        )

        li = pd.read_parquet(
            f"{sf_tiny}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
        )
        z = _md5_low64("z#msc") % MSC_P
        hs = [
            _md5_low64(f"{a}#{b}#{c}#{d}") % MSC_P
            for a, b, c, d in zip(
                li["l_orderkey"], li["l_linenumber"], li["l_partkey"], li["l_suppkey"]
            )
        ]
        direct = functools.reduce(lambda acc, h: (acc * ((z - h) % MSC_P)) % MSC_P, hs, 1)
        got = q_multiset_check(sf_tiny)
        assert got["product_16"].iloc[0] == direct
        assert got["product_32_equal"].iloc[0] == 1
        assert got["corruption_detected"].iloc[0] == 1
        assert got["n_rows"].iloc[0] == len(hs)

    def test_order_and_partition_invariance(self, ray_session, sf_tiny):
        """The modular product is invariant under ANY permutation and
        ANY partitioning — the property that makes it a shuffle
        verifier."""
        from searchengine_ray.pipelines.queries import MSC_P, _md5_low64

        rng = np.random.RandomState(5)
        hs = rng.randint(0, MSC_P, size=500).tolist()
        z = 123456789

        def prod(seq):
            return functools.reduce(
                lambda acc, h: (acc * ((z - h) % MSC_P)) % MSC_P, seq, 1
            )

        p1 = prod(hs)
        p2 = prod(list(reversed(hs)))
        idx = rng.permutation(500)
        p3 = prod([hs[i] for i in idx])
        # partitioned: 7 arbitrary buckets
        parts = [prod([h for i, h in enumerate(hs) if i % 7 == b]) for b in range(7)]
        p4 = functools.reduce(lambda a, x: (a * x) % MSC_P, parts, 1)
        assert p1 == p2 == p3 == p4
        # single-element tamper detected
        hs2 = hs[:]
        hs2[17] = (hs2[17] + 1) % MSC_P
        assert prod(hs2) != p1
