"""Wave 197: MC PageRank + point in polygon — vs direct walk replay
and matplotlib-free geometric ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestMcPagerank:
    def test_matches_walk_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            MCPR_LEN,
            MCPR_WALKS,
            _doc_graph_edges,
            _md5_low64,
            q_mc_pagerank,
        )

        edges, n = _doc_graph_edges(sf_tiny)
        keep = edges[:, 0] != edges[:, 1]
        packed = np.unique(edges[keep, 0] * (1 << 31) + edges[keep, 1])
        src = (packed >> 31).astype(np.int64)
        dst = (packed & ((1 << 31) - 1)).astype(np.int64)
        starts = np.searchsorted(src, np.arange(n))
        ends = np.searchsorted(src, np.arange(n), side="right")
        visits = np.zeros(n, np.int64)
        for v0 in range(n):
            for wk in range(MCPR_WALKS):
                cur = v0
                visits[cur] += 1
                for step in range(MCPR_LEN):
                    draw = _md5_low64(f"mc#{v0}#{wk}#{step}#{cur}")
                    if draw % 100 < 15:
                        break
                    deg = int(ends[cur] - starts[cur])
                    if deg == 0:
                        break
                    cur = int(dst[starts[cur] + (draw // 100) % deg])
                    visits[cur] += 1
        got = q_mc_pagerank(sf_tiny)
        assert got["total_visits"].iloc[0] == int(visits.sum())
        order = np.lexsort((np.arange(n), -visits))[:20]
        assert list(got["doc_id"]) == [int(x) for x in order]

    def test_hubs_dominate(self, ray_session, sf_tiny):
        """The id%10 hub targets should populate the MC top-20 heavily
        and track exact PageRank."""
        from searchengine_ray.pipelines.queries import q_mc_pagerank

        got = q_mc_pagerank(sf_tiny)
        assert got["overlap_with_exact"].iloc[0] >= 12
        assert (got["doc_id"].iloc[:5] < 10).sum() >= 3


class TestPointInPolygon:
    def test_matches_shoelace_winding_brute(self, ray_session, sf_tiny):
        """An independent winding-number implementation must agree on
        every point class."""
        from searchengine_ray.pipelines.queries import PIP_POLY, q_point_in_polygon

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type", "value"])
        px = (ev["ts"].astype("int64") // 86_400_000_000 % 30).to_numpy(np.int64)
        py = (np.rint(ev["value"].to_numpy() * 100).astype(np.int64)) // 100
        poly = PIP_POLY
        k = len(poly)
        want = {}
        for t, x, y in zip(ev["event_type"], px, py):
            boundary = False
            cross = 0
            for i in range(k):
                x1, y1 = poly[i]
                x2, y2 = poly[(i + 1) % k]
                c = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
                if (
                    c == 0
                    and min(x1, x2) <= x <= max(x1, x2)
                    and min(y1, y2) <= y <= max(y1, y2)
                ):
                    boundary = True
                if (y1 > y) != (y2 > y):
                    lhs = (x2 - x1) * (y - y1) - (x - x1) * (y2 - y1)
                    if (lhs > 0) if (y2 - y1) > 0 else (lhs < 0):
                        cross += 1
            ins, bd, tot = want.get(t, (0, 0, 0))
            want[t] = (
                ins + int(cross % 2 == 1 and not boundary),
                bd + int(boundary),
                tot + 1,
            )
        got = q_point_in_polygon(sf_tiny)
        for r in got.itertuples():
            assert (r.n_inside, r.n_boundary, r.n_total) == want[r.event_type]

    def test_known_points(self):
        """Hand-checked containment for the fixed hexagon."""
        from searchengine_ray.pipelines.queries import PIP_POLY

        poly = PIP_POLY
        k = len(poly)

        def inside(x, y):
            cross = 0
            for i in range(k):
                x1, y1 = poly[i]
                x2, y2 = poly[(i + 1) % k]
                if (y1 > y) != (y2 > y):
                    lhs = (x2 - x1) * (y - y1) - (x - x1) * (y2 - y1)
                    if (lhs > 0) if (y2 - y1) > 0 else (lhs < 0):
                        cross += 1
            return cross % 2 == 1

        cx = sum(p[0] for p in poly) / k
        cy = sum(p[1] for p in poly) / k
        assert inside(int(cx), int(cy))  # centroid of a convex-ish hexagon
        assert not inside(0, 0)
        assert not inside(29, 9999)
