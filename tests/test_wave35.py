"""Brute-force identity tests for the weighted-SSSP and piecewise-trend
wave (registry 258-259)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestSsspWeighted:
    def _graph(self, n: int):
        ids = np.arange(n, dtype=np.int64)
        edges = np.concatenate(
            [
                np.stack([ids, (ids * 7 + 13) % n], axis=1),
                np.stack([ids, (ids * 31 + 5) % n], axis=1),
                np.stack([ids, ids % 10], axis=1),
            ]
        )
        weights = 1 + (edges[:, 0] + edges[:, 1]) % 5
        return edges, weights

    def test_matches_dijkstra_bruteforce(self, ray_session, sf_tiny):
        import heapq

        from searchengine_ray.pipelines.queries import q_sssp_weighted

        n = len(pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"]))
        edges, weights = self._graph(n)
        adj: dict[int, list] = {}
        for (a, b), w in zip(edges.tolist(), weights.tolist()):
            if a == b:
                continue
            adj.setdefault(a, []).append((b, w))
            adj.setdefault(b, []).append((a, w))
        INF = float("inf")
        dist = {0: 0}
        pq = [(0, 0)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, INF):
                continue
            for v, w in adj.get(u, []):
                nd = d + w
                if nd < dist.get(v, INF):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        hist = pd.Series(list(dist.values())).value_counts().sort_index()
        got = q_sssp_weighted(sf_tiny)
        assert list(got["dist"]) == list(hist.index)
        assert list(got["n_nodes"]) == list(hist.values)

    def test_dataset_tier_identity(self, ray_session):
        from searchengine_ray.functions.graph import sssp_weighted

        n = 300
        edges, weights = self._graph(n)
        dense = sssp_weighted(edges, weights, n, dense_gate=10**9)
        dist = sssp_weighted(edges, weights, n, dense_gate=0)
        pd.testing.assert_frame_equal(dense, dist)


class TestPiecewiseTrend:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_piecewise_trend

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts"])
        day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy(np.int64)
        vc = pd.Series(day).value_counts().sort_index()
        y = vc.to_numpy(np.float64)
        n = len(y)
        x = np.arange(1, n + 1, dtype=np.float64)

        def ols_sse(xs, ys):
            m = len(xs)
            vx = (xs * xs).sum() - xs.sum() ** 2 / m
            num = (xs * ys).sum() - xs.sum() * ys.sum() / m
            sse = ((ys * ys).sum() - ys.sum() ** 2 / m) - num * num / vx
            return num / vx, sse

        best = None
        for s in range(3, n - 2):
            sl1, e1 = ols_sse(x[:s], y[:s])
            sl2, e2 = ols_sse(x[s:], y[s:])
            if best is None or e1 + e2 < best[0]:
                best = (e1 + e2, s, sl1, sl2)
        _, sse_full = ols_sse(x, y)
        got = q_piecewise_trend(sf_tiny)
        assert int(got["split_index"].iloc[0]) == best[1]
        assert int(got["split_day"].iloc[0]) == int(vc.index[best[1] - 1])
        assert abs(got["slope_before"].iloc[0] - best[2]) < 1e-5
        assert abs(got["slope_after"].iloc[0] - best[3]) < 1e-5
        assert abs(got["sse_ratio"].iloc[0] - best[0] / sse_full) < 1e-5
        assert got["sse_ratio"].iloc[0] <= 1.0 + 1e-9
