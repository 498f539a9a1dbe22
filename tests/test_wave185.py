"""Wave 185: Matrix-Tree spanning trees + weighted intervals — vs
known closed forms, float determinants and exhaustive subsets."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd


def _bareiss_trees(u, v, m):
    L = np.zeros((m, m), np.int64)
    for a, b in zip(u, v):
        L[a, a] += 1
        L[b, b] += 1
        L[a, b] -= 1
        L[b, a] -= 1
    M = [[int(L[i][j]) for j in range(1, m)] for i in range(1, m)]
    d = m - 1
    prev = 1
    for k in range(d - 1):
        p = M[k][k]
        for i in range(k + 1, d):
            for j in range(k + 1, d):
                M[i][j] = (p * M[i][j] - M[i][k] * M[k][j]) // prev
        prev = p
    return M[d - 1][d - 1]


class TestSpanningTrees:
    def test_known_graphs(self):
        # K4: 4^2 = 16 trees; C5: 5 trees; path P4: 1 tree
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        assert _bareiss_trees([e[0] for e in k4], [e[1] for e in k4], 4) == 16
        c5 = [(i, (i + 1) % 5) for i in range(5)]
        assert _bareiss_trees([e[0] for e in c5], [e[1] for e in c5], 5) == 5
        p4 = [(0, 1), (1, 2), (2, 3)]
        assert _bareiss_trees([e[0] for e in p4], [e[1] for e in p4], 4) == 1
        # Cayley: K5 has 5^3 = 125
        k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        assert _bareiss_trees([e[0] for e in k5], [e[1] for e in k5], 5) == 125

    def test_matches_float_det_and_enumeration(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SPT_N, q_spanning_trees

        got = q_spanning_trees(sf_tiny)
        m = int(got["n_nodes_sub"].iloc[0])
        ii = np.arange(m, dtype=np.int64)
        edges = np.concatenate(
            [
                np.stack([ii, (ii * 7 + 13) % m], axis=1),
                np.stack([ii, (ii * 31 + 5) % m], axis=1),
                np.stack([ii, ii % 5], axis=1),
            ]
        )
        keep = edges[:, 0] != edges[:, 1]
        packed = np.unique(
            np.minimum(edges[keep, 0], edges[keep, 1]) * (1 << 31)
            + np.maximum(edges[keep, 0], edges[keep, 1])
        )
        u = (packed >> 31).astype(int)
        v = (packed & ((1 << 31) - 1)).astype(int)
        # float determinant cross-check
        L = np.zeros((m, m))
        for a, b in zip(u, v):
            L[a, a] += 1
            L[b, b] += 1
            L[a, b] -= 1
            L[b, a] -= 1
        det = np.linalg.det(L[1:, 1:])
        assert abs(got["n_spanning_trees"].iloc[0] - det) < 1e-3 * max(det, 1)
        # exhaustive: count spanning subsets of size m-1 that are trees
        trees = 0
        E = list(zip(u.tolist(), v.tolist()))
        for sub in itertools.combinations(range(len(E)), m - 1):
            parent = list(range(m))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            ok = True
            for ei in sub:
                a, b = E[ei]
                ra, rb = find(a), find(b)
                if ra == rb:
                    ok = False
                    break
                parent[ra] = rb
            trees += ok
        assert got["n_spanning_trees"].iloc[0] == trees


class TestWeightedIntervals:
    def test_matches_exhaustive_subsets(self, ray_session, sf_tiny):
        """For users with ≤ 12 intervals, enumerate every independent
        subset and check the DP found the max weight."""
        from searchengine_ray.pipelines.queries import (
            WI_DUR_US,
            q_weighted_intervals,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        p = ev[ev["event_type"] == "purchase"].copy()
        p["s"] = p["ts"].astype("int64")
        p["w"] = np.rint(p["value"].to_numpy() * 100).astype(np.int64)
        got = q_weighted_intervals(sf_tiny).set_index("user_id")
        checked = 0
        for uid, g in p.groupby("user_id"):
            if len(g) > 12:
                continue
            s = g["s"].to_numpy(np.int64)
            e = s + WI_DUR_US
            w = g["w"].to_numpy(np.int64)
            best = 0
            for r in range(len(s) + 1):
                for sub in itertools.combinations(range(len(s)), r):
                    iv = sorted((s[i], e[i], w[i]) for i in sub)
                    if all(iv[i][1] <= iv[i + 1][0] for i in range(len(iv) - 1)):
                        best = max(best, sum(x[2] for x in iv))
            assert got.loc[int(uid), "best_weight"] == best, uid
            checked += 1
        assert checked > 0

    def test_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_weighted_intervals

        got = q_weighted_intervals(sf_tiny)
        assert (got["best_weight"] <= got["total_weight"]).all()
        assert (got["best_weight"] > 0).all()
