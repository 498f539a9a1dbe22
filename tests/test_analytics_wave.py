"""Analytics wave: windowed distinct (WAU), Markov transitions, Gini,
Benford, entropy, association rules, BFS hops — brute-force / invariant
checks complementing the DuckDB gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestBfsHops:
    def test_dense_matches_dataset_path(self, ray_session):
        from searchengine_ray.functions.graph import bfs_hops

        n = 400
        ids = np.arange(n, dtype=np.int64)
        edges = np.concatenate(
            [
                np.stack([ids, (ids * ids + 3) % n], axis=1),
                np.stack([ids, (ids * 13 + 17) % n], axis=1),
            ]
        )
        dense = bfs_hops(edges, n, seed=0, max_iter=20)
        dist = bfs_hops(edges, n, seed=0, max_iter=20, dense_gate=0)
        pd.testing.assert_frame_equal(dense, dist)

    def test_disconnected_component_absent(self, ray_session):
        from searchengine_ray.functions.graph import bfs_hops

        # two separate paths: 0-1-2 and 3-4
        edges = np.array([[0, 1], [1, 2], [3, 4]])
        out = bfs_hops(edges, 5, seed=0)
        assert out["node"].tolist() == [0, 1, 2]
        assert out["dist"].tolist() == [0, 1, 2]

    def test_nonconvergence_raises(self, ray_session):
        from searchengine_ray.functions.graph import bfs_hops

        edges = np.stack([np.arange(9), np.arange(1, 10)], axis=1)
        with pytest.raises(RuntimeError):
            bfs_hops(edges, 10, seed=0, max_iter=3)












