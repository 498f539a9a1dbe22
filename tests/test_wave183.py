"""Wave 183: SSI pivots + LWW-set CRDT — vs op-pair brute force and
permutation-merge convergence."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestSsiDangerous:
    def test_matches_op_pair_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import CS_TXNS, q_ssi_dangerous

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        BASE = 1_704_067_200_000_000
        ev["p"] = (ev["ts"].astype("int64") - BASE) * (1 << 20) + (
            ev["event_id"] % (1 << 20)
        )
        ev["txn"] = ev["user_id"] % CS_TXNS
        ev["wr"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64) % 2 == 1
        edges = set()
        for _, g in ev.groupby("event_type"):
            reads = g[~g["wr"]]
            writes = g[g["wr"]]
            for rt, rp in zip(reads["txn"], reads["p"]):
                for wt, wp in zip(writes["txn"], writes["p"]):
                    if rt != wt and rp < wp:
                        edges.add((int(rt), int(wt)))
        got = q_ssi_dangerous(sf_tiny)
        assert got["n_rw_edges"].iloc[0] == len(edges)
        for r in got.itertuples():
            assert r.rw_out == sum(1 for i, j in edges if i == r.txn)
            assert r.rw_in == sum(1 for i, j in edges if j == r.txn)
            assert r.pivot == (1 if r.rw_in > 0 and r.rw_out > 0 else 0)

    def test_pivot_superset_of_cycles(self, ray_session, sf_tiny):
        """Every SI anomaly cycle contains a pivot — with this hot
        schedule the pivot set must be non-empty whenever edges form
        any 2-cycle."""
        from searchengine_ray.pipelines.queries import q_ssi_dangerous

        got = q_ssi_dangerous(sf_tiny)
        if got["n_rw_edges"].iloc[0] >= got["txn"].nunique():
            assert got["n_pivots"].iloc[0] > 0


class TestLwwSet:
    def test_matches_direct_eval(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_lww_set

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        t = ev[ev["event_type"].isin(["purchase", "error"])].copy()
        t["elem"] = t["user_id"] % 50
        t["ts_us"] = t["ts"].astype("int64")
        NEG = -(1 << 62)
        stats = {}
        for r in t.itertuples():
            aa, ab, ra, rb = stats.get(r.elem, (NEG, NEG, NEG, NEG))
            par = int(r.event_id) % 2
            if r.event_type == "purchase":
                if par == 0:
                    aa = max(aa, r.ts_us)
                else:
                    ab = max(ab, r.ts_us)
            else:
                if par == 0:
                    ra = max(ra, r.ts_us)
                else:
                    rb = max(rb, r.ts_us)
            stats[r.elem] = (aa, ab, ra, rb)
        pm = sum(max(a, b) >= max(c, d) for a, b, c, d in stats.values())
        pa_ = sum(a >= c for a, b, c, d in stats.values())
        pb = sum(b >= d for a, b, c, d in stats.values())
        dv = sum((a >= c) != (b >= d) for a, b, c, d in stats.values())
        got = q_lww_set(sf_tiny)
        assert got["n_elements"].iloc[0] == len(stats)
        assert got["present_merged"].iloc[0] == pm
        assert got["present_a"].iloc[0] == pa_
        assert got["present_b"].iloc[0] == pb
        assert got["n_diverged"].iloc[0] == dv

    def test_merge_order_independence(self, ray_session, sf_tiny):
        """CRDT property: merging replica histories in ANY interleaved
        order gives the same presence set (max is ACI) — replay two
        orders and compare."""
        from searchengine_ray.pipelines.queries import q_lww_set

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        t = ev[ev["event_type"].isin(["purchase", "error"])].copy()
        t["elem"] = t["user_id"] % 50
        t["ts_us"] = t["ts"].astype("int64")

        def replay(df):
            add, rem = {}, {}
            for r in df.itertuples():
                d = add if r.event_type == "purchase" else rem
                d[r.elem] = max(d.get(r.elem, -(1 << 62)), r.ts_us)
            return {
                e: add.get(e, -(1 << 62)) >= rem.get(e, -(1 << 62))
                for e in set(add) | set(rem)
            }

        fwd = replay(t)
        rev = replay(t.iloc[::-1])
        assert fwd == rev
        got = q_lww_set(sf_tiny)
        assert got["present_merged"].iloc[0] == sum(fwd.values())
