"""Brute-force identity tests for the spatial/rolling-corr wave
(registry 323-324)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestSpatialGridJoin:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SPATIAL_EPS,
            q_spatial_grid_join,
        )

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet")
        m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)[:, :2]
        x, y = m[:, 0], m[:, 1]
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        ids = emb["vec_id"].to_numpy(np.int64)
        ok = (dx * dx + dy * dy <= SPATIAL_EPS**2) & (
            ids[:, None] < ids[None, :]
        )
        want_pairs = int(ok.sum())
        cx = np.floor(x / SPATIAL_EPS).astype(np.int64)
        cy = np.floor(y / SPATIAL_EPS).astype(np.int64)
        cells = pd.DataFrame({"cx": cx, "cy": cy}).groupby(["cx", "cy"]).size()
        got = q_spatial_grid_join(sf_tiny)
        assert got["n_points"].iloc[0] == len(emb)
        assert got["n_pairs"].iloc[0] == want_pairs
        assert got["n_cells"].iloc[0] == len(cells)
        assert got["max_cell"].iloc[0] == int(cells.max())

    def test_pair_count_positive_and_bounded(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_spatial_grid_join

        got = q_spatial_grid_join(sf_tiny)
        n = got["n_points"].iloc[0]
        assert 0 < got["n_pairs"].iloc[0] < n * (n - 1) // 2


class TestRollingCorr:
    def test_matches_pandas_rolling(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import ROLLCORR_W, q_rolling_corr

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type"])
        day = (
            ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        ).astype(int)
        g = pd.DataFrame(
            {
                "day": day,
                "p": (ev["event_type"] == "purchase").astype(int),
                "c": (ev["event_type"] == "click").astype(int),
            }
        )
        daily = g.groupby("day").sum().sort_index()
        roll = (
            daily["p"].rolling(ROLLCORR_W).corr(daily["c"]).dropna().to_numpy()
        )
        got = q_rolling_corr(sf_tiny)
        assert len(got) == len(daily) - ROLLCORR_W + 1
        np.testing.assert_allclose(got["corr"], roll, atol=1e-6)
        # windowed sums exact
        sp = daily["p"].rolling(ROLLCORR_W).sum().dropna().to_numpy(np.int64)
        assert (got["sum_p"].to_numpy() == sp).all()

    def test_corr_in_range(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_rolling_corr

        got = q_rolling_corr(sf_tiny)
        assert ((got["corr"] >= -1.0 - 1e-9) & (got["corr"] <= 1.0 + 1e-9)).all()
