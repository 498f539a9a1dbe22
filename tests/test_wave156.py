"""Wave 156: Borůvka MSF + Katz centrality — vs brute-force Kruskal
union-find / dense matrix-series recomputation, and numpy-tier ==
Dataset-tier identity."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _gen_edges(n):
    ids = np.arange(n, dtype=np.int64)
    return np.concatenate(
        [
            np.stack([ids, (ids * 7 + 13) % n], axis=1),
            np.stack([ids, (ids * 31 + 5) % n], axis=1),
            np.stack([ids, ids % 10], axis=1),
        ]
    )


def _kruskal_brute(u, v, w, n):
    """Textbook Kruskal with sequential union-find over the (w, u, v)
    total order — the independent MSF oracle."""
    order = np.lexsort((v, u, w))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    taken = []
    for i in order:
        a, b = find(int(u[i])), find(int(v[i]))
        if a != b:
            parent[max(a, b)] = min(a, b)
            taken.append((int(u[i]), int(v[i]), int(w[i])))
    return sorted(taken, key=lambda t: (t[2], t[0], t[1]))


def _canon(n):
    edges = _gen_edges(n)
    keep = edges[:, 0] != edges[:, 1]
    u = np.minimum(edges[keep, 0], edges[keep, 1])
    v = np.maximum(edges[keep, 0], edges[keep, 1])
    # dedup pairs (weight is a function of u+v so any dup keeps same w)
    packed = u * (1 << 31) + v
    _, idx = np.unique(packed, return_index=True)
    u, v = u[idx], v[idx]
    return u, v, (1 + (u + v) % 5).astype(np.int64)


class TestBoruvkaMst:
    def test_matches_kruskal(self, ray_session):
        from searchengine_ray.functions.graph import boruvka_mst

        for n in (17, 50, 333):
            u, v, w = _canon(n)
            got = boruvka_mst(np.stack([u, v], axis=1), w, n)
            want = _kruskal_brute(u, v, w, n)
            assert list(map(tuple, got[["u", "v", "w"]].to_numpy())) == want, n

    def test_spanning_forest_weight_minimal(self, ray_session):
        """Forest size = n − #components, and no single edge swap can
        improve it (cycle property spot check on a small graph)."""
        from searchengine_ray.functions.graph import boruvka_mst

        n = 60
        u, v, w = _canon(n)
        got = boruvka_mst(np.stack([u, v], axis=1), w, n)
        # count components by union-find over ALL edges
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(u.tolist(), v.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        n_comp = len({find(x) for x in range(n)})
        assert len(got) == n - n_comp

    def test_ray_tier_matches_numpy_tier(self, ray_session):
        from searchengine_ray.functions.graph import boruvka_mst

        n = 200
        u, v, w = _canon(n)
        local = boruvka_mst(np.stack([u, v], axis=1), w, n)
        dist = boruvka_mst(np.stack([u, v], axis=1), w, n, dense_gate=0)
        pd.testing.assert_frame_equal(local, dist)


class TestKatzCentrality:
    def _brute(self, edges, n, alpha, iters):
        A = np.zeros((n, n))
        for s, d in edges:
            if s != d:
                A[int(s), int(d)] += 1.0
        x = np.zeros(n)
        ones = np.ones(n)
        for _ in range(iters):
            x = alpha * (A.T @ (x + ones))
        return x

    def test_matches_dense_series(self, ray_session):
        from searchengine_ray.functions.graph import katz_centrality

        for n in (30, 120):
            edges = _gen_edges(n)
            got = katz_centrality(edges, n, alpha=0.05, iters=12)
            want = self._brute(edges, n, 0.05, 12)
            assert np.allclose(got, want, rtol=1e-12, atol=1e-15)

    def test_ray_tier_matches_numpy_tier(self, ray_session):
        from searchengine_ray.functions.graph import katz_centrality

        n = 150
        edges = _gen_edges(n)
        local = katz_centrality(edges, n, alpha=0.05, iters=6)
        dist = katz_centrality(edges, n, alpha=0.05, iters=6, dense_gate=0)
        assert np.allclose(local, dist, rtol=1e-12, atol=1e-15)

    def test_no_outdegree_normalisation(self, ray_session):
        """Katz of a 2-star: the centre's score is α·k (k leaves), NOT
        α — the defining difference vs PageRank's degree split."""
        from searchengine_ray.functions.graph import katz_centrality

        k = 5
        edges = np.array([[i + 1, 0] for i in range(k)], np.int64)
        got = katz_centrality(edges, k + 1, alpha=0.1, iters=3)
        assert np.isclose(got[0], 0.1 * k)
        assert np.allclose(got[1:], 0.0)
