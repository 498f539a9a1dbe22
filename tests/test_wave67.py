"""Brute-force identity tests for the bipartite/learned-index wave
(registry 331-332)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestBipartiteCheck:
    def test_matches_networkless_bfs(self, ray_session, sf_tiny):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.queries import (
            _component_edges,
            q_bipartite_check,
        )

        n = pq.read_metadata(f"{sf_tiny}/documents.parquet").num_rows
        e = _component_edges(n)
        e = e[e[:, 0] != e[:, 1]]
        canon = {(min(a, b), max(a, b)) for a, b in e}
        adj: dict[int, list[int]] = {}
        for u, v in canon:
            adj.setdefault(int(u), []).append(int(v))
            adj.setdefault(int(v), []).append(int(u))
        dist = {s: 0 for s in range(5)}
        frontier = list(range(5))
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj.get(u, []):
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        assert len(dist) == n  # all reachable from the 5 seeds
        odd = sum(1 for u, v in canon if dist[int(u)] % 2 == dist[int(v)] % 2)
        got = q_bipartite_check(sf_tiny)
        assert got["n_nodes"].iloc[0] == n
        assert got["n_edges"].iloc[0] == len(canon)
        assert got["odd_edges"].iloc[0] == odd
        assert got["is_bipartite"].iloc[0] == int(odd == 0)

    def test_flag_consistent(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bipartite_check

        got = q_bipartite_check(sf_tiny)
        assert got["is_bipartite"].iloc[0] == int(got["odd_edges"].iloc[0] == 0)
        assert got["odd_edges"].iloc[0] <= got["n_edges"].iloc[0]


class TestLearnedIndexAudit:
    def test_matches_polyfit(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_learned_index_audit

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["event_type", "value"]
        )
        p = ev[ev["event_type"] == "purchase"]
        m = (p["value"].round(3) * 1e3).round().astype(np.int64)
        dom = m.value_counts().sort_index()
        keys = dom.index.to_numpy(np.float64)
        pos = np.concatenate(([0], np.cumsum(dom.to_numpy())))[:-1].astype(
            np.float64
        )
        slope, intercept = np.polyfit(keys, pos, 1)
        err = np.abs(pos - (intercept + slope * keys))
        got = q_learned_index_audit(sf_tiny)
        assert got["n_keys"].iloc[0] == len(dom)
        # outputs are rounded to 6dp per the oracle contract
        assert got["slope"].iloc[0] == pytest.approx(slope, abs=5.1e-7)
        assert got["intercept"].iloc[0] == pytest.approx(intercept, abs=5.1e-7)
        assert got["max_abs_err"].iloc[0] == pytest.approx(err.max(), abs=5.1e-7)
        assert got["mean_abs_err"].iloc[0] == pytest.approx(err.mean(), abs=5.1e-7)

    def test_error_bounds_sane(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_learned_index_audit

        got = q_learned_index_audit(sf_tiny)
        assert got["mean_abs_err"].iloc[0] <= got["max_abs_err"].iloc[0]
        assert got["slope"].iloc[0] > 0  # positions increase with key
