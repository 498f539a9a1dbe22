"""Triangle counting over edge Datasets (functions/graph.py)."""

from __future__ import annotations

import itertools

import numpy as np
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
