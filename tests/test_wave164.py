"""Wave 164: sampled Brandes betweenness + harmonic closeness — vs a
textbook all-pairs/per-source brute force and tier identity."""

from __future__ import annotations

import collections

import numpy as np


def _gen_edges(n):
    ids = np.arange(n, dtype=np.int64)
    return np.concatenate(
        [
            np.stack([ids, (ids * 7 + 13) % n], axis=1),
            np.stack([ids, (ids * 31 + 5) % n], axis=1),
            np.stack([ids, ids % 10], axis=1),
        ]
    )


def _adj(edges, n):
    adj = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))
    return adj


def _brandes_one_source(adj, n, s):
    """Textbook Brandes single-source dependency (queue-based)."""
    sigma = [0] * n
    dist = [-1] * n
    sigma[s], dist[s] = 1, 0
    order = []
    q = collections.deque([s])
    while q:
        v = q.popleft()
        order.append(v)
        for w in adj[v]:
            if dist[w] < 0:
                dist[w] = dist[v] + 1
                q.append(w)
            if dist[w] == dist[v] + 1:
                sigma[w] += sigma[v]
    delta = [0.0] * n
    for w in reversed(order):
        for v in adj[w]:
            if dist[v] == dist[w] - 1:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
    delta[s] = 0.0
    return delta


class TestBetweenness:
    def test_matches_textbook_brandes(self, ray_session):
        from searchengine_ray.functions.graph import betweenness_sampled

        for n in (40, 150):
            edges = _gen_edges(n)
            adj = _adj(edges, n)
            sources = [0, 7, 13, 42]
            want = np.zeros(n)
            for s in sources:
                if s < n:
                    want += np.array(_brandes_one_source(adj, n, s))
            got = betweenness_sampled(edges, n, sources)
            assert np.allclose(got, want, rtol=1e-10, atol=1e-12), n

    def test_ray_tier_matches_numpy_tier(self, ray_session):
        from searchengine_ray.functions.graph import betweenness_sampled

        n = 80
        edges = _gen_edges(n)
        local = betweenness_sampled(edges, n, [0, 7])
        dist = betweenness_sampled(edges, n, [0, 7], dense_gate=0)
        assert np.allclose(local, dist, rtol=1e-10, atol=1e-12)

    def test_path_star_exact(self, ray_session):
        """On a path 0-1-2-3-4, Brandes from source 0 gives the inner
        nodes their downstream-pair dependencies (3, 2, 1)."""
        from searchengine_ray.functions.graph import betweenness_sampled

        edges = np.array([[i, i + 1] for i in range(4)], np.int64)
        got = betweenness_sampled(edges, 5, [0])
        assert np.allclose(got, [0.0, 3.0, 2.0, 1.0, 0.0])


