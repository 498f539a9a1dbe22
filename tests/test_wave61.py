"""Brute-force identity tests for the coreset/Wasserstein wave
(registry 319-320)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestCoresetKcenter:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            KCENTER_K,
            q_coreset_kcenter,
        )

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet")
        ids = emb["vec_id"].to_numpy(np.int64)
        mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(mat, axis=1)
        chosen = [0]
        want = []
        for step in range(1, KCENTER_K):
            cpos = [int(np.flatnonzero(ids == c)[0]) for c in chosen]
            cos = (mat @ mat[cpos].T) / np.outer(norm, norm[cpos])
            d = np.round(1.0 - cos, 6).min(axis=1)
            d[np.isin(ids, chosen)] = -1.0
            o = np.lexsort((ids, -d))[0]
            want.append((step, int(ids[o]), float(d[o])))
            chosen.append(int(ids[o]))
        got = q_coreset_kcenter(sf_tiny)
        for (s, v, dd), row in zip(want, got.itertuples()):
            assert (row.step, row.vec_id) == (s, v)
            assert row.dist == pytest.approx(dd, abs=1e-9)

    def test_radii_nonincreasing_and_distinct(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_coreset_kcenter

        got = q_coreset_kcenter(sf_tiny)
        # greedy k-center covering radius never increases
        assert (np.diff(got["dist"].to_numpy()) <= 1e-12).all()
        assert got["vec_id"].is_unique
        assert (got["vec_id"] != 0).all()  # seed never re-picked


class TestWasserstein1d:
    def test_matches_scipy_style(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_wasserstein_1d

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["user_id", "event_type", "value"]
        )
        p = ev[ev["event_type"] == "purchase"]
        m = (p["value"].round(3) * 1e3).round().astype(np.int64)
        arm = (p["user_id"] % 2).to_numpy()
        a = np.sort(m[arm == 0].to_numpy())
        b = np.sort(m[arm == 1].to_numpy())
        # reference: mean |F_a - F_b| integral over the merged domain
        dom = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, dom, side="right") / len(a)
        fb = np.searchsorted(b, dom, side="right") / len(b)
        w1 = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(dom))) / 1000.0
        got = q_wasserstein_1d(sf_tiny)
        assert got["n_a"].iloc[0] == len(a)
        assert got["n_b"].iloc[0] == len(b)
        assert got["n_domain"].iloc[0] == len(dom)
        assert got["w1"].iloc[0] == pytest.approx(w1, rel=1e-6, abs=1e-6)

    def test_w1_nonnegative(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_wasserstein_1d

        got = q_wasserstein_1d(sf_tiny)
        assert got["w1"].iloc[0] >= 0.0
