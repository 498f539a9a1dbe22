"""Brute-force identity tests for the computational-geometry wave
(convex hull + Douglas-Peucker, registry 417-418)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _daily(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts"])
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    return day.value_counts().sort_index()


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _chain(points):
    st = []
    for p in points:
        while len(st) >= 2 and _cross(st[-2], st[-1], p) <= 0:
            st.pop()
        st.append(p)
    return st


class TestConvexHull:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_convex_hull

        daily = _daily(sf_tiny)
        pts = list(zip(daily.index.astype(int), daily.astype(int)))
        lower = _chain(pts)
        upper = _chain(list(reversed(pts)))
        got = q_convex_hull(sf_tiny)
        lo = got[got["chain"] == "lower"].sort_values("pos")
        up = got[got["chain"] == "upper"].sort_values("pos")
        assert list(zip(lo["day"], lo["c"])) == lower
        assert list(zip(up["day"], up["c"])) == upper

    def test_hull_contains_all_points(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_convex_hull

        daily = _daily(sf_tiny)
        pts = list(zip(daily.index.astype(int), daily.astype(int)))
        got = q_convex_hull(sf_tiny)
        lo = list(
            zip(
                got[got["chain"] == "lower"].sort_values("pos")["day"],
                got[got["chain"] == "lower"].sort_values("pos")["c"],
            )
        )
        # every point lies on or above every lower-chain edge
        for a, b in zip(lo, lo[1:]):
            for p in pts:
                if a[0] <= p[0] <= b[0]:
                    assert _cross(a, b, p) >= 0


class TestDouglasPeucker:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            DP_EPS,
            q_douglas_peucker,
        )

        daily = _daily(sf_tiny)
        xs = daily.index.astype(int).tolist()
        ys = daily.astype(int).tolist()
        n = len(xs)
        keep = {0, n - 1}
        stack = [(0, n - 1)]
        while stack:
            a, b = stack.pop()
            if b - a < 2:
                continue
            dx, dy = xs[b] - xs[a], ys[b] - ys[a]
            bn, bk = -1, -1
            for k in range(a + 1, b):
                num = abs(dx * (ys[k] - ys[a]) - dy * (xs[k] - xs[a]))
                if num > bn:
                    bn, bk = num, k
            if bn * bn > DP_EPS * DP_EPS * (dx * dx + dy * dy):
                keep.add(bk)
                stack.append((a, bk))
                stack.append((bk, b))
        got = q_douglas_peucker(sf_tiny)
        assert got["day"].tolist() == [xs[i] for i in sorted(keep)]
        assert got["c"].tolist() == [ys[i] for i in sorted(keep)]

    def test_simplification_error_bound(self, ray_session, sf_tiny):
        """Every dropped point lies within eps of its simplified
        segment (the Douglas-Peucker guarantee)."""
        from searchengine_ray.pipelines.queries import (
            DP_EPS,
            q_douglas_peucker,
        )

        daily = _daily(sf_tiny)
        xs = daily.index.astype(int).to_numpy()
        ys = daily.astype(int).to_numpy()
        got = q_douglas_peucker(sf_tiny).sort_values("pos")
        kept_days = got["day"].tolist()
        for (d1, c1), (d2, c2) in zip(
            zip(got["day"], got["c"]), zip(got["day"][1:], got["c"][1:])
        ):
            mask = (xs > d1) & (xs < d2)
            dx, dy = d2 - d1, c2 - c1
            for x, y in zip(xs[mask], ys[mask]):
                num = abs(dx * (y - c1) - dy * (x - d1))
                assert num * num <= DP_EPS * DP_EPS * (dx * dx + dy * dy)
        assert kept_days[0] == int(xs[0]) and kept_days[-1] == int(xs[-1])
