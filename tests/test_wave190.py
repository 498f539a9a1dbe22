"""Wave 190: min cut + percolation — vs Edmonds-Karp max-flow duality
and nested-threshold monotonicity."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd


class TestMinCut:
    def test_maxflow_mincut_duality(self, ray_session, sf_tiny):
        """An independent Edmonds-Karp max flow must equal the
        exhaustive min cut (strong duality)."""
        from searchengine_ray.pipelines.queries import SPT_N, q_min_cut

        got = q_min_cut(sf_tiny)
        m = int(got["n_nodes"].iloc[0])
        ii = np.arange(m)
        edges = np.concatenate(
            [
                np.stack([ii, (ii * 7 + 13) % m], axis=1),
                np.stack([ii, (ii * 31 + 5) % m], axis=1),
                np.stack([ii, ii % 5], axis=1),
            ]
        )
        keep = edges[:, 0] != edges[:, 1]
        packed = np.unique(edges[keep, 0] * (1 << 31) + edges[keep, 1])
        src = (packed >> 31).astype(int)
        dst = (packed & ((1 << 31) - 1)).astype(int)
        cap = {}
        for a, b in zip(src, dst):
            cap[(a, b)] = cap.get((a, b), 0) + 1 + (a + b) % 5
        s, t = 0, m - 1
        flow = 0
        res = dict(cap)
        while True:
            # BFS augmenting path in the residual graph
            parent = {s: None}
            q = collections.deque([s])
            while q and t not in parent:
                x = q.popleft()
                for (a, b), c in res.items():
                    if a == x and c > 0 and b not in parent:
                        parent[b] = (a, b)
                        q.append(b)
            if t not in parent:
                break
            # bottleneck
            path = []
            node = t
            while parent[node] is not None:
                path.append(parent[node])
                node = parent[node][0]
            aug = min(res[e] for e in path)
            for a, b in path:
                res[(a, b)] -= aug
                res[(b, a)] = res.get((b, a), 0) + aug
            flow += aug
        assert got["min_cut"].iloc[0] == flow

    def test_cut_separates(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_min_cut

        got = q_min_cut(sf_tiny)
        assert 1 <= got["source_side_size"].iloc[0] <= got["n_nodes"].iloc[0] - 1
        assert got["n_optimal_cuts"].iloc[0] >= 1
        assert got["min_cut"].iloc[0] > 0  # graph is connected


class TestPercolationSweep:
    def test_matches_union_find(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            _doc_graph_edges,
            _md5_low64,
            q_percolation_sweep,
        )

        edges, n = _doc_graph_edges(sf_tiny)
        keep = edges[:, 0] != edges[:, 1]
        packed = np.unique(
            np.minimum(edges[keep, 0], edges[keep, 1]) * (1 << 31)
            + np.maximum(edges[keep, 0], edges[keep, 1])
        )
        u = (packed >> 31).astype(int)
        v = (packed & ((1 << 31) - 1)).astype(int)
        hv = np.array([_md5_low64(f"{a}#{b}") % 100 for a, b in zip(u, v)])
        got = q_percolation_sweep(sf_tiny).set_index("p_pct")
        for p in got.index:
            mask = hv < p
            parent = list(range(n))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in zip(u[mask], v[mask]):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            sizes = collections.Counter(find(x) for x in range(n))
            assert got.loc[p, "kept_edges"] == int(mask.sum())
            assert got.loc[p, "giant_size"] == max(sizes.values())
            assert got.loc[p, "n_components"] == len(sizes)

    def test_monotone_in_p(self, ray_session, sf_tiny):
        """Kept-edge sets are nested in p, so the giant grows and the
        component count shrinks monotonically."""
        from searchengine_ray.pipelines.queries import q_percolation_sweep

        got = q_percolation_sweep(sf_tiny).sort_values("p_pct")
        assert (np.diff(got["kept_edges"]) >= 0).all()
        assert (np.diff(got["giant_size"]) >= 0).all()
        assert (np.diff(got["n_components"]) <= 0).all()
