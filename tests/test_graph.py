"""Triangle counting over edge Datasets (functions/graph.py)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from searchengine_ray.functions.graph import triangle_count


def _ds(edges):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )


def _brute(edges):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({x for e in und for x in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )


def test_k4_with_noise(ray_session):
    # K4 (4 triangles) + a 2-path + duplicate/reversed edges + self loop
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3),
             (4, 5), (5, 6), (1, 0), (2, 2)]
    assert triangle_count(_ds(edges)) == 4


def test_triangle_free(ray_session):
    # bipartite graphs have no triangles
    edges = [(i, 100 + j) for i in range(5) for j in range(5)]
    assert triangle_count(_ds(edges)) == 0


def test_k5(ray_session):
    edges = list(itertools.combinations(range(5), 2))
    assert triangle_count(_ds(edges)) == 10


def test_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(42)
    edges = [tuple(map(int, e)) for e in rng.integers(0, 40, size=(300, 2))]
    assert triangle_count(_ds(edges)) == _brute(edges)


@pytest.mark.parametrize("hub_deg", [64])
def test_hub_graph(ray_session, hub_deg):
    # star + a rim cycle: triangles = hub-adjacent rim edges
    edges = [(0, i) for i in range(1, hub_deg + 1)]
    edges += [(i, i % hub_deg + 1) for i in range(1, hub_deg + 1)]
    assert triangle_count(_ds(edges)) == _brute(edges)


class TestLinkPrediction:
    def test_common_neighbors_small(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.graph import common_neighbor_scores

        # star around 0 plus edge 1-2: candidates (1,3),(2,3),(1,2 is adjacent? no 1-2 IS an edge)
        edges = pa.table(
            {
                "src": pa.array([0, 0, 0, 1], pa.int64()),
                "dst": pa.array([1, 2, 3, 2], pa.int64()),
            }
        )
        out = common_neighbor_scores(rd.from_arrow(edges), top_k=10)
        got = {(r.node_a, r.node_b): r.common for r in out.itertuples(index=False)}
        # non-adjacent pairs sharing neighbor 0: (1,3), (2,3); (1,2) adjacent → excluded
        assert got == {(1, 3): 1, (2, 3): 1}

    def test_matches_bruteforce_on_random_graph(self, ray_session):
        import itertools

        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.graph import common_neighbor_scores

        rng = np.random.default_rng(5)
        m = rng.integers(0, 40, size=(120, 2))
        m = m[m[:, 0] != m[:, 1]]
        edges = pa.table(
            {"src": pa.array(m[:, 0], pa.int64()), "dst": pa.array(m[:, 1], pa.int64())}
        )
        out = common_neighbor_scores(rd.from_arrow(edges), top_k=1000)
        got = {(r.node_a, r.node_b): r.common for r in out.itertuples(index=False)}
        # brute force
        adj = {}
        eset = set()
        for s, d in m:
            u, v = int(min(s, d)), int(max(s, d))
            eset.add((u, v))
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        want = {}
        for u, v in itertools.combinations(sorted(adj), 2):
            if (u, v) in eset:
                continue
            c = len(adj[u] & adj[v])
            if c > 0:
                want[(u, v)] = c
        assert got == want


class TestKCore:
    def _random_edges(self, n, m, seed=0):
        rng = np.random.RandomState(seed)
        return rng.randint(0, n, size=(m, 2)).astype(np.int64)

    def test_matches_peeling_bruteforce(self, ray_session):
        from searchengine_ray.functions.graph import k_core

        n, k = 200, 3
        edges = self._random_edges(n, 500)
        got = k_core(edges, n, k=k, max_iter=50)
        # reference peel with sets
        E = {(min(a, b), max(a, b)) for a, b in edges.tolist() if a != b}
        nodes = set(range(n))
        while True:
            deg: dict[int, int] = {}
            for x, y in E:
                deg[x] = deg.get(x, 0) + 1
                deg[y] = deg.get(y, 0) + 1
            keep = {v for v in nodes if deg.get(v, 0) >= k}
            if keep == nodes:
                break
            nodes = keep
            E = {(x, y) for x, y in E if x in nodes and y in nodes}
        assert set(got["node"]) == nodes
        for r in got.itertuples():
            assert deg[r.node] == r.deg

    def test_dataset_tier_identity(self, ray_session, monkeypatch):
        import searchengine_ray.functions.graph as G

        n, k = 300, 3
        edges = self._random_edges(n, 900, seed=7)
        dense = G.k_core(edges, n, k=k, max_iter=50)
        monkeypatch.setattr(G, "KCORE_DENSE_GATE", 1)
        dist = G.k_core(edges, n, k=k, max_iter=50)
        pd.testing.assert_frame_equal(dense, dist)

    def test_nonconvergence_raises(self, ray_session):
        import pytest

        from searchengine_ray.functions.graph import k_core

        n = 100
        edges = self._random_edges(n, 160, seed=3)
        with pytest.raises(RuntimeError):
            k_core(edges, n, k=3, max_iter=0)


class TestConnectedComponents:
    @staticmethod
    def _random_edges(n: int, m: int, seed: int) -> np.ndarray:
        rng = np.random.default_rng(seed)
        return rng.integers(0, n, size=(m, 2)).astype(np.int64)

    @staticmethod
    def _brute(edges: np.ndarray, n: int) -> dict[int, int]:
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            if a == b:
                continue
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # component label = min member id
        members: dict[int, list[int]] = {}
        for v in range(n):
            members.setdefault(find(v), []).append(v)
        return {v: min(vs) for r, vs in members.items() for v in vs}

    def test_matches_union_find(self, ray_session):
        from searchengine_ray.functions.graph import connected_components

        n = 200
        edges = self._random_edges(n, 150, seed=11)  # sparse: many components
        got = connected_components(edges, n, max_iter=100)
        want = self._brute(edges, n)
        assert len(got) == n
        assert {int(r.node): int(r.comp) for r in got.itertuples()} == want

    def test_isolated_nodes_are_singletons(self, ray_session):
        from searchengine_ray.functions.graph import connected_components

        got = connected_components(np.array([[0, 1]], dtype=np.int64), 4, max_iter=10)
        assert got["comp"].tolist() == [0, 0, 2, 3]

    def test_dataset_tier_identity(self, ray_session):
        from searchengine_ray.functions.graph import connected_components

        n = 300
        edges = self._random_edges(n, 400, seed=5)
        dense = connected_components(edges, n, max_iter=100)
        dist = connected_components(edges, n, max_iter=100, dense_gate=0)
        pd.testing.assert_frame_equal(dense, dist)

    def test_nonconvergence_raises(self, ray_session):
        from searchengine_ray.functions.graph import connected_components

        n = 50
        edges = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)  # path: slow
        with pytest.raises(RuntimeError):
            connected_components(edges, n, max_iter=2)
