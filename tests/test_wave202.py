"""Wave 202: widest path via max-ST + Chan variance merge — vs brute
maximin Dijkstra and numerical ground truth."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd


class TestWidestPath:
    def test_matches_maximin_dijkstra(self, ray_session, sf_tiny):
        """Hu's identity: widest path through the maximum spanning
        tree equals brute maximin Dijkstra from the source."""
        from searchengine_ray.pipelines.queries import (
            _doc_graph_edges,
            q_widest_path,
        )

        edges, n = _doc_graph_edges(sf_tiny)
        keep = edges[:, 0] != edges[:, 1]
        u = np.minimum(edges[keep, 0], edges[keep, 1])
        v = np.maximum(edges[keep, 0], edges[keep, 1])
        packed = np.unique(u * (1 << 31) + v)
        u = (packed >> 31).astype(int)
        v = (packed & ((1 << 31) - 1)).astype(int)
        w = 1 + (u + v) % 5
        adj = {}
        for a, b, cw in zip(u, v, w):
            adj.setdefault(int(a), []).append((int(b), int(cw)))
            adj.setdefault(int(b), []).append((int(a), int(cw)))
        band = {0: 1 << 30}
        heap = [(-(1 << 30), 0)]
        while heap:
            nb, x = heapq.heappop(heap)
            nb = -nb
            if nb < band.get(x, -1):
                continue
            for y, cw in adj.get(x, []):
                cand = min(nb, cw)
                if cand > band.get(y, -1):
                    band[y] = cand
                    heapq.heappush(heap, (-cand, y))
        hist = {}
        for node, b in band.items():
            if node != 0:
                hist[b] = hist.get(b, 0) + 1
        got = q_widest_path(sf_tiny)
        assert dict(zip(got["bandwidth"], got["n_nodes"])) == hist
        assert got["n_reached"].iloc[0] == len(band) - 1

    def test_bandwidth_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_widest_path

        got = q_widest_path(sf_tiny)
        assert (got["bandwidth"] >= 1).all()
        assert (got["bandwidth"] <= 5).all()


class TestChanVariance:
    def test_matches_direct_merge(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CHAN_BUCKETS,
            q_chan_variance,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["value"])
        x = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        mom = {}
        for xv in x.tolist():
            n, sx, sx2 = mom.get(xv % CHAN_BUCKETS, (0, 0, 0))
            mom[xv % CHAN_BUCKETS] = (n + 1, sx + xv, sx2 + xv * xv)
        n_t, mean_t, m2_t = 0, 0.0, 0.0
        for bk in sorted(mom):
            nb, sx, sx2 = mom[bk]
            mb = sx / nb
            m2b = sx2 - sx * sx / nb
            if n_t == 0:
                n_t, mean_t, m2_t = nb, mb, m2b
                continue
            delta = mb - mean_t
            tot = n_t + nb
            m2_t = m2_t + m2b + delta * delta * n_t * nb / tot
            mean_t = mean_t + delta * nb / tot
            n_t = tot
        got = q_chan_variance(sf_tiny)
        assert got["chan_var_micro"].iloc[0] == int(
            np.rint(round(m2_t / n_t, 6) * 1e6)
        )
        exact = (x.astype(object) ** 2).sum() / len(x) - (int(x.sum()) / len(x)) ** 2
        assert abs(got["exact_var_micro"].iloc[0] / 1e6 - exact) < 1e-4

    def test_chan_is_accurate(self, ray_session, sf_small):
        """The stable merge should agree with the exact integer
        variance to within micro scale — that's why it's the standard."""
        from searchengine_ray.pipelines.queries import q_chan_variance

        got = q_chan_variance(sf_small)
        assert got["gap_micro"].iloc[0] <= 10
        assert got["chan_var_micro"].iloc[0] > 0
