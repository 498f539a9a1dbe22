"""Wave 200: t-digest + HdrHistogram — quantile-sketch accuracy vs
exact order statistics."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestTdigestQuantiles:
    def test_accuracy_against_exact(self, ray_session, sf_small):
        """t-digest's defining property: TAIL quantiles (p95/p99) are
        near-exact because the k1 scale shrinks tail centroids; the
        median may be coarser."""
        from searchengine_ray.pipelines.queries import q_tdigest_quantiles

        got = q_tdigest_quantiles(sf_small).set_index("pct")
        for pct in (95, 99):
            est = got.loc[pct, "tdigest_micro"] / 1e6
            exact = got.loc[pct, "exact_cents"]
            assert abs(est - exact) / exact < 0.03, pct
        est50 = got.loc[50, "tdigest_micro"] / 1e6
        assert abs(est50 - got.loc[50, "exact_cents"]) / got.loc[50, "exact_cents"] < 0.2

    def test_centroid_count_bounded(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import TD_DELTA, q_tdigest_quantiles

        got = q_tdigest_quantiles(sf_tiny)
        assert got["n_centroids"].iloc[0] <= TD_DELTA
        assert got["n_centroids"].iloc[0] >= TD_DELTA // 2

    def test_k1_boundaries_monotone(self):
        import math

        from searchengine_ray.pipelines.queries import TD_DELTA

        qs = [
            (math.sin(k * math.pi / TD_DELTA - math.pi / 2) + 1) / 2
            for k in range(TD_DELTA + 1)
        ]
        assert qs[0] == 0.0 and abs(qs[-1] - 1.0) < 1e-12
        assert all(b > a for a, b in zip(qs, qs[1:]))
        # tail boundary spacing shrinks (the accuracy concentration)
        assert qs[1] - qs[0] < qs[TD_DELTA // 2] - qs[TD_DELTA // 2 - 1]


class TestHdrHistogram:
    def test_matches_direct_bucketing(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            HDR_SUBBITS,
            TD_QUERIES,
            q_hdr_histogram,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["value"])
        x = np.maximum(np.rint(ev["value"].to_numpy() * 100).astype(np.int64), 1)

        def floor_of(val):
            bl = int(val).bit_length()
            if bl <= HDR_SUBBITS:
                return int(val)
            sh = bl - HDR_SUBBITS
            return (int(val) >> sh) << sh

        floors = np.array([floor_of(v) for v in x], np.int64)
        vals, counts = np.unique(floors, return_counts=True)
        cum = np.cumsum(counts)
        n = len(x)
        srt = np.sort(x)
        got = q_hdr_histogram(sf_tiny).set_index("pct")
        for qp in TD_QUERIES:
            r = max(min(-(-n * qp // 100), n), 1)
            est = int(vals[int(np.searchsorted(cum, r, side="left"))])
            assert got.loc[qp, "hdr_floor_cents"] == est
            assert got.loc[qp, "exact_cents"] == int(srt[r - 1])

    def test_relative_error_bound(self, ray_session, sf_small):
        from searchengine_ray.pipelines.queries import HDR_SUBBITS, q_hdr_histogram

        got = q_hdr_histogram(sf_small)
        err = (got["exact_cents"] - got["hdr_floor_cents"]) / got["exact_cents"]
        assert (err >= 0).all()
        assert (err <= 1 / (1 << (HDR_SUBBITS - 1)) + 1e-9).all()
