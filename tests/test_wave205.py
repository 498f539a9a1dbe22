"""Wave 205: LT fountain decode + KVV RANKING online matching — vs
exact decode recovery and true offline maximum matching."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _md5l(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")


class TestLtFountain:
    def test_full_recovery_and_overhead(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            LT_K,
            LT_SYMBOLS,
            q_lt_fountain,
        )

        got = q_lt_fountain(sf_tiny)
        # the query asserts internally that all K sources decode; the
        # released counts must sum to exactly K
        assert got["released"].sum() == LT_K
        assert (got["released"] > 0).all()
        assert got["n_symbols"].iloc[0] == LT_SYMBOLS
        assert got["overhead_pct"].iloc[0] == (LT_SYMBOLS - LT_K) * 100 // LT_K

    def test_peeling_needs_degree_one(self, ray_session, sf_tiny):
        """Round 0 can only release sources covered by degree-1
        symbols — verify against a direct scan of the symbol spec."""
        from searchengine_ray.pipelines.queries import (
            LT_K,
            LT_SYMBOLS,
            q_lt_fountain,
        )
        import pyarrow.parquet as pq

        ids = (
            pq.read_table(f"{sf_tiny}/documents.parquet", columns=["doc_id"])[
                "doc_id"
            ]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[:LT_K]
        )

        def degree_of(s):
            return [1, 1, 2, 2, 2, 3, 3, 3, 4, 4][_md5l(f"deg#{s}") % 10]

        def members_of(s, d):
            out = []
            t = 0
            while len(out) < d:
                cand = _md5l(f"pick#{s}#{t}") % LT_K
                if cand not in out:
                    out.append(int(cand))
                t += 1
            return out

        deg1 = set()
        for s in range(LT_SYMBOLS):
            d = degree_of(s)
            if d == 1:
                deg1.add(members_of(s, 1)[0])
        got = q_lt_fountain(sf_tiny)
        r0 = got[got["round"] == 0]["released"].iloc[0]
        assert r0 == len(deg1)

    def test_decode_determinism_across_scales(
        self, ray_session, sf_tiny, sf_small
    ):
        """Source blocks derive from the first K doc ids, identical at
        both scales — the whole decode trace must match."""
        from searchengine_ray.pipelines.queries import q_lt_fountain

        a = q_lt_fountain(sf_tiny)
        b = q_lt_fountain(sf_small)
        pd.testing.assert_frame_equal(a, b)


class TestKvvMatching:
    @staticmethod
    def _instance(sf_dir):
        import pyarrow.parquet as pq
        from searchengine_ray.pipelines.queries import KVV_ONLINE

        sup = np.sort(
            pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])[
                "s_suppkey"
            ]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cus = np.sort(
            pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])[
                "c_custkey"
            ]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )[:KVV_ONLINE]
        adj = {
            t: [
                i
                for i, s in enumerate(sup.tolist())
                if _md5l(f"e#{s}#{c}") % 3 == 0
            ]
            for t, c in enumerate(cus.tolist())
        }
        return len(sup), len(cus), adj

    def test_against_offline_maximum(self, ray_session, sf_tiny):
        """Hungarian-style augmenting paths give the true offline OPT;
        RANKING must achieve ≥ (1 − 1/e)·OPT (its worst-case bound)."""
        from searchengine_ray.pipelines.queries import q_kvv_matching

        ns, nc, adj = self._instance(sf_tiny)
        match_of_sup = {}

        def try_aug(t, seen):
            for i in adj[t]:
                if i in seen:
                    continue
                seen.add(i)
                if i not in match_of_sup or try_aug(match_of_sup[i], seen):
                    match_of_sup[i] = t
                    return True
            return False

        opt = sum(try_aug(t, set()) for t in range(nc))
        got = q_kvv_matching(sf_tiny)
        r = int(got["ranking_matched"].iloc[0])
        g = int(got["greedy_matched"].iloc[0])
        assert r <= opt and g <= opt
        assert r >= (1 - 1 / np.e) * opt - 1e-9
        assert g >= opt / 2  # any maximal matching is ≥ OPT/2

    def test_matching_is_feasible_replay(self, ray_session, sf_tiny):
        """Re-run the RANKING replay directly and confirm the count and
        that no supplier is used twice."""
        from searchengine_ray.pipelines.queries import q_kvv_matching

        ns, nc, adj = self._instance(sf_tiny)
        import pyarrow.parquet as pq

        sup = np.sort(
            pq.read_table(f"{sf_tiny}/supplier.parquet", columns=["s_suppkey"])[
                "s_suppkey"
            ]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        rank = np.argsort(
            np.lexsort(
                (sup, np.array([_md5l(f"rk#{s}") for s in sup], np.uint64))
            )
        )
        free = np.ones(ns, bool)
        used = []
        for t in range(nc):
            cands = [i for i in adj[t] if free[i]]
            if not cands:
                continue
            p = min(cands, key=lambda i: int(rank[i]))
            free[p] = False
            used.append(p)
        assert len(used) == len(set(used))
        got = q_kvv_matching(sf_tiny)
        assert got["ranking_matched"].iloc[0] == len(used)
        assert got["n_edges"].iloc[0] == sum(len(v) for v in adj.values())
