"""Wave 195: wedge sampling + Slope One — vs exact triangle machinery
and direct prediction replay."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestWedgeSample:
    def test_exact_closure_equals_triangle_count(self, ray_session, sf_tiny):
        """Closed wedges / 3 must equal the repo's exact triangle
        counter on the same graph — an independent identity."""
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.graph import triangle_count
        from searchengine_ray.pipelines.queries import (
            _doc_graph_edges,
            q_wedge_sample,
        )

        got = q_wedge_sample(sf_tiny)
        edges, n = _doc_graph_edges(sf_tiny)
        keep = edges[:, 0] != edges[:, 1]
        eds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(edges[keep, 0], pa.int64()),
                    "dst": pa.array(edges[keep, 1], pa.int64()),
                }
            )
        )
        exact = triangle_count(eds)
        assert got["exact_triangles"].iloc[0] == exact

    def test_estimate_within_sampling_error(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_wedge_sample

        got = q_wedge_sample(sf_tiny)
        exact = got["exact_triangles"].iloc[0]
        est = got["est_triangles"].iloc[0]
        # binomial sampling error at K=2000 → generous 5σ band
        assert abs(est - exact) < max(0.3 * exact, 20)
        assert got["closed_in_sample"].iloc[0] <= got["k_sampled"].iloc[0]


class TestSlopeOne:
    def test_matches_direct_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_slope_one, round_half_away

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id", "event_type"])
        cnt = ev.groupby(["user_id", "event_type"]).size().reset_index(name="c")
        types = sorted(cnt["event_type"].unique())
        tidx = {t: i for i, t in enumerate(types)}
        users = sorted(cnt["user_id"].unique())
        uidx = {u: i for i, u in enumerate(users)}
        k = len(types)
        R = np.zeros((len(users), k), np.int64)
        for r in cnt.itertuples():
            R[uidx[r.user_id], tidx[r.event_type]] = r.c
        obs = R > 0
        S = np.zeros((k, k))
        C = np.zeros((k, k), np.int64)
        for i in range(k):
            for j in range(k):
                if i != j:
                    co = obs[:, i] & obs[:, j]
                    S[i, j] = (R[co, i] - R[co, j]).sum()
                    C[i, j] = co.sum()
        tot = 0
        cells = 0
        for ui in range(len(users)):
            for i in range(k):
                if not obs[ui, i]:
                    continue
                num = den = 0
                for j in range(k):
                    if j != i and obs[ui, j] and C[i, j] > 0:
                        num += (S[i, j] / C[i, j] + R[ui, j]) * C[i, j]
                        den += C[i, j]
                if den:
                    cells += 1
                    tot += int(
                        np.rint(round_half_away(abs(num / den - R[ui, i]), 6) * 1e6)
                    )
        got = q_slope_one(sf_tiny)
        assert got["n_cells"].iloc[0] == cells
        assert got["sum_abs_err_micro"].iloc[0] == tot

    def test_mae_sanity_band(self, ray_session, sf_small):
        """On this near-exchangeable count matrix Slope One does NOT
        beat the global mean (items are statistically interchangeable,
        so r_uj + dev carries within-user noise) — an honest negative
        result; the sanity band just pins the scale."""
        from searchengine_ray.pipelines.queries import q_slope_one

        ev = pd.read_parquet(f"{sf_small}/events.parquet", columns=["user_id", "event_type"])
        cnt = ev.groupby(["user_id", "event_type"]).size()
        base_mae = (cnt - cnt.mean()).abs().mean()
        got = q_slope_one(sf_small)
        mae = got["mae_micro"].iloc[0] / 1e6
        assert 0 < mae < 2 * base_mae
