"""Brute-force identity tests for the time-series-mining wave
(matrix profile + DTW, registry 415-416)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _daily(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts", "event_type"])
    ev["day"] = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    return ev


class TestMatrixProfile:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            MP_EXCL,
            MP_WINDOW,
            q_matrix_profile,
        )

        ev = _daily(sf_tiny)
        daily = ev.groupby("day").size().sort_index()
        days = daily.index.to_numpy(np.int64)
        c = daily.to_numpy(np.int64)
        nw = len(c) - MP_WINDOW + 1
        got = q_matrix_profile(sf_tiny)
        assert len(got) == nw
        for i in range(nw):
            best = None
            bj = -1
            for j in range(nw):
                if abs(i - j) < MP_EXCL:
                    continue
                d = int(((c[i : i + MP_WINDOW] - c[j : j + MP_WINDOW]) ** 2).sum())
                if best is None or d < best:
                    best, bj = d, j
            row = got[got["win_day"] == days[i]].iloc[0]
            assert row["dist2"] == best
            assert row["nn_day"] == days[bj]

    def test_profile_symmetric_floor(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_matrix_profile

        got = q_matrix_profile(sf_tiny)
        assert (got["dist2"] >= 0).all()
        # the discord strictly dominates the motif floor
        assert got["dist2"].max() > got["dist2"].min()


class TestDtwEvents:
    @staticmethod
    def _dtw(a, b):
        BIG = 1 << 50
        n = len(a)
        prev = [BIG] * (n + 1)
        prev[0] = 0
        for i in range(1, n + 1):
            curr = [BIG] * (n + 1)
            for j in range(1, n + 1):
                cost = abs(int(a[i - 1]) - int(b[j - 1]))
                curr[j] = cost + min(prev[j], curr[j - 1], prev[j - 1])
            prev = curr
        return prev[n]

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            DTW_DAYS,
            DTW_PAIRS,
            q_dtw_events,
        )

        ev = _daily(sf_tiny)
        d0 = int(ev["day"].min())
        got = q_dtw_events(sf_tiny)
        for a, b in DTW_PAIRS:
            xs = {}
            for t in (a, b):
                v = np.zeros(DTW_DAYS, np.int64)
                g = ev[ev["event_type"] == t].groupby("day").size()
                for d, cc in g.items():
                    k = int(d) - d0
                    if 0 <= k < DTW_DAYS:
                        v[k] = cc
                xs[t] = v
            row = got[(got["type_a"] == a) & (got["type_b"] == b)].iloc[0]
            assert row["dtw"] == self._dtw(xs[a], xs[b])
            assert row["l1"] == int(np.abs(xs[a] - xs[b]).sum())

    def test_dtw_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_dtw_events

        got = q_dtw_events(sf_tiny)
        # elastic alignment can only reduce cost vs rigid L1
        assert (got["dtw"] <= got["l1"]).all()
        assert (got["dtw"] >= 0).all()

    def test_dtw_identity_and_shift(self):
        a = np.array([1, 5, 1, 1, 1], np.int64)
        b = np.roll(a, 1)
        assert self._dtw(a, a) == 0
        # a one-step shift is nearly free under DTW, costly under L1
        assert self._dtw(a, b) < int(np.abs(a - b).sum())
