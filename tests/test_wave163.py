"""Wave 163: spam mass + ALS factorization — vs direct recomputation
and algebraic invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestSpamMass:
    def test_matches_direct_iteration(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PAGERANK_ITERS,
            SPAM_SEED_MOD,
            _doc_graph_edges,
            q_spam_mass,
        )

        edges, n = _doc_graph_edges(sf_tiny)
        keep = edges[:, 0] != edges[:, 1]
        src, dst = edges[keep, 0], edges[keep, 1]
        outdeg = np.bincount(src, minlength=n)
        inv = np.zeros(n)
        inv[outdeg > 0] = 1.0 / outdeg[outdeg > 0]
        w = inv[src]
        seeds = (np.arange(n) % SPAM_SEED_MOD) == 0
        tele = np.where(seeds, n / float(seeds.sum()), 0.0)
        x = np.ones(n)
        xt = np.ones(n)
        for _ in range(PAGERANK_ITERS):
            x = 0.15 + 0.85 * np.bincount(dst, weights=w * x[src], minlength=n)
            xt = 0.15 * tele + 0.85 * np.bincount(dst, weights=w * xt[src], minlength=n)
        got = q_spam_mass(sf_tiny)
        assert np.allclose(got["pr"], np.round(x, 6), atol=1e-6)
        assert np.allclose(got["pr_trusted"], np.round(xt, 6), atol=1e-6)
        assert np.allclose(got["spam_mass"], np.round((x - xt) / x, 6), atol=1e-6)

    def test_seed_pages_carry_low_mass(self, ray_session, sf_tiny):
        """Trusted seeds themselves receive direct teleport trust, so
        their spam mass must be far below the untrusted average."""
        from searchengine_ray.pipelines.queries import SPAM_SEED_MOD, q_spam_mass

        got = q_spam_mass(sf_tiny)
        is_seed = (got["doc_id"] % SPAM_SEED_MOD) == 0
        assert got.loc[is_seed, "spam_mass"].mean() < got.loc[~is_seed, "spam_mass"].mean()
        # mass is bounded above by 1 (trusted rank is non-negative)
        assert (got["spam_mass"] <= 1.0 + 1e-9).all()

    def test_equal_teleport_mass(self, ray_session, sf_tiny):
        """Both chains carry the same total teleport mass, so total
        rank mass should be comparable (within damping leakage)."""
        from searchengine_ray.pipelines.queries import q_spam_mass

        got = q_spam_mass(sf_tiny)
        assert abs(got["pr"].sum() - got["pr_trusted"].sum()) / got["pr"].sum() < 0.05


class TestAlsFactorize:
    def _brute(self, sf_dir):
        from searchengine_ray.pipelines.queries import (
            ALS_ITERS,
            ALS_LAMBDA,
            _md5_low64,
            round_half_away,
        )

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
        r = ev.groupby(["user_id", "event_type"]).size().reset_index(name="c")
        types = sorted(r["event_type"].unique())
        tidx = {t: i for i, t in enumerate(types)}
        users = sorted(r["user_id"].unique())
        uidx = {u: i for i, u in enumerate(users)}
        C = np.zeros((len(users), len(types)))
        for row in r.itertuples():
            C[uidx[row.user_id], tidx[row.event_type]] = row.c
        Y = np.zeros((len(types), 2))
        for t, i in tidx.items():
            hv = _md5_low64(t)
            Y[i, 0] = ((hv % 1000) + 500) / 1000.0
            Y[i, 1] = (((hv // 1000) % 1000) + 500) / 1000.0
        lam = ALS_LAMBDA

        def solve(C_, F, obs_axis):
            mask = (C_ > 0).astype(float)
            a11 = mask @ (F[:, 0] ** 2) + lam
            a12 = mask @ (F[:, 0] * F[:, 1])
            a22 = mask @ (F[:, 1] ** 2) + lam
            b = C_ @ F
            det = a11 * a22 - a12 * a12
            x1 = (a22 * b[:, 0] - a12 * b[:, 1]) / det
            x2 = (a11 * b[:, 1] - a12 * b[:, 0]) / det
            return np.stack([round_half_away(x1, 10), round_half_away(x2, 10)], axis=1)

        for _ in range(ALS_ITERS):
            X = solve(C, Y, 0)
            Y = solve(C.T, X, 1)
        X = solve(C, Y, 0)
        pred = X @ Y.T
        obs = C > 0
        sq = (C - pred)[obs] ** 2
        micro = np.rint(round_half_away(sq, 6) * 1e6).astype(np.int64)
        import math

        rmse = math.sqrt((int(micro.sum()) / 1e6) / int(obs.sum()))
        return types, Y, rmse, int(obs.sum()), len(users)

    def test_matches_brute_dense(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_als_factorize, round_half_away

        types, Y, rmse, n_obs, n_users = self._brute(sf_tiny)
        got = q_als_factorize(sf_tiny)
        assert list(got["event_type"]) == types
        assert np.allclose(got["f1"], round_half_away(Y[:, 0], 6), atol=1e-9)
        assert np.allclose(got["f2"], round_half_away(Y[:, 1], 6), atol=1e-9)
        assert abs(got["rmse"].iloc[0] - round(rmse, 6)) < 1e-9
        assert (got["n_obs"] == n_obs).all()
        assert (got["n_users"] == n_users).all()

    def test_iterations_do_not_increase_rmse(self, ray_session, sf_tiny):
        """ALS is a coordinate-descent on the regularized objective —
        the fit after 3 rounds must beat the init-factor fit."""
        from searchengine_ray.pipelines.queries import (
            ALS_LAMBDA,
            _md5_low64,
            q_als_factorize,
            round_half_away,
        )

        got = q_als_factorize(sf_tiny)
        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id", "event_type"])
        r = ev.groupby(["user_id", "event_type"]).size().reset_index(name="c")
        types = sorted(r["event_type"].unique())
        tidx = {t: i for i, t in enumerate(types)}
        users = {u: i for i, u in enumerate(sorted(r["user_id"].unique()))}
        C = np.zeros((len(users), len(types)))
        for row in r.itertuples():
            C[users[row.user_id], tidx[row.event_type]] = row.c
        Y0 = np.zeros((len(types), 2))
        for t, i in tidx.items():
            hv = _md5_low64(t)
            Y0[i, 0] = ((hv % 1000) + 500) / 1000.0
            Y0[i, 1] = (((hv // 1000) % 1000) + 500) / 1000.0
        # one user-solve against the INIT factors, then measure
        lam = ALS_LAMBDA
        mask = (C > 0).astype(float)
        a11 = mask @ (Y0[:, 0] ** 2) + lam
        a12 = mask @ (Y0[:, 0] * Y0[:, 1])
        a22 = mask @ (Y0[:, 1] ** 2) + lam
        b = C @ Y0
        det = a11 * a22 - a12 * a12
        X0 = np.stack(
            [
                round_half_away((a22 * b[:, 0] - a12 * b[:, 1]) / det, 10),
                round_half_away((a11 * b[:, 1] - a12 * b[:, 0]) / det, 10),
            ],
            axis=1,
        )
        rmse0 = np.sqrt((((C - X0 @ Y0.T)[C > 0]) ** 2).mean())
        assert got["rmse"].iloc[0] <= rmse0 + 1e-9
