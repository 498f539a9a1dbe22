"""Wave 157: AMS F2 sketch + DGIM window counting — vs brute-force
recomputation (direct Counter F2 / sequential DGIM bucket replay)."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd


class TestAmsF2:
    def test_matches_direct_counter(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            AMS_R,
            _engine,
            _md5_low64,
            q_ams_f2,
        )

        eng = _engine(sf_tiny, "punct")
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        cf = collections.Counter()
        for t in docs["text"]:
            cf.update(eng.analyze(t))
        got = q_ams_f2(sf_tiny)
        f2 = sum(v * v for v in cf.values())
        assert (got["f2_exact"] == f2).all()
        for i in range(AMS_R):
            z = sum(
                (1 if _md5_low64(f"{t}#{i}") % 2 == 1 else -1) * v
                for t, v in cf.items()
            )
            row = got[got["sketch_id"] == i].iloc[0]
            assert row["z"] == z, i
            assert row["x"] == z * z

    def test_estimator_formula(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ams_f2

        got = q_ams_f2(sf_tiny)
        x = got.sort_values("sketch_id")["x"].to_numpy(np.int64)
        g = np.sort([x[j * 4 : (j + 1) * 4].sum() for j in range(4)])
        est = (int(g[1]) + int(g[2])) / 8.0
        assert np.isclose(got["estimate"].iloc[0], round(est, 6))
        # each X_i is an unbiased estimator; the median-of-means should
        # land within a factor ~3 of truth on this corpus
        f2 = got["f2_exact"].iloc[0]
        assert 0.2 * f2 < est < 5.0 * f2


def _dgim_replay(bits_ts, window_us, t_max):
    """Textbook sequential DGIM with unbounded max window: maintain
    buckets (size, ts); on each 1 add size-1 bucket and cascade-merge
    when 3 of a size exist (merge the two OLDEST). Query: sum full
    active buckets + half the straddling (oldest active) one."""
    buckets = []  # newest first: (size, ts)
    for ts in bits_ts:
        buckets.insert(0, (1, ts))
        size = 1
        while True:
            same = [i for i, b in enumerate(buckets) if b[0] == size]
            if len(same) < 3:
                break
            i1, i2 = same[-2], same[-1]  # two oldest
            merged = (size * 2, buckets[i1][1])  # ts of the NEWER of the two
            del buckets[i2]
            del buckets[i1]
            # insert keeping newest-first order (before any bucket older)
            pos = 0
            while pos < len(buckets) and buckets[pos][1] > merged[1]:
                pos += 1
            buckets.insert(pos, merged)
            size *= 2
    boundary = t_max - window_us
    active = [(s, ts) for s, ts in buckets if ts > boundary]
    if not active:
        return 0, 0, len(buckets)
    stot = sum(s for s, _ in active)
    oldest = active[-1][0]
    return 2 * stot - oldest, oldest, len(buckets)


class TestDgimWindow:
    def test_matches_sequential_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            DGIM_WINDOW_DAYS,
            q_dgim_window,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["ts", "event_id", "event_type"]
        )
        t_max = int(ev["ts"].astype("int64").max())
        clicks = ev[ev["event_type"] == "click"].copy()
        clicks["a"] = clicks["ts"].astype("int64")
        clicks = clicks.sort_values(["a", "event_id"])
        got = q_dgim_window(sf_tiny).set_index("window_days")
        for wd in DGIM_WINDOW_DAYS:
            est_x2, oldest, n_buckets = _dgim_replay(
                clicks["a"].tolist(), wd * 86_400_000_000, t_max
            )
            row = got.loc[wd]
            assert row["est_x2"] == est_x2, wd
            assert row["oldest_size"] == oldest, wd
            assert row["n_buckets"] == n_buckets, wd
            exact = int((clicks["a"] > t_max - wd * 86_400_000_000).sum())
            assert row["exact"] == exact
            assert row["err_x2"] == abs(est_x2 - 2 * exact)
            assert row["bound_ok"] == 1

    def test_digit_representation_unique(self):
        from searchengine_ray.pipelines.queries import _dgim_digits

        for m in range(1, 2000):
            d = _dgim_digits(m)
            assert all(x in (1, 2) for x in d)
            assert sum(x * (1 << i) for i, x in enumerate(d)) == m
