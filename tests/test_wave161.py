"""Wave 161: HyperBall ANF + SALSA — vs exact BFS neighborhood
functions / dense normalized-walk recomputation, and tier identity."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _gen_edges(n):
    ids = np.arange(n, dtype=np.int64)
    return np.concatenate(
        [
            np.stack([ids, (ids * 7 + 13) % n], axis=1),
            np.stack([ids, (ids * 31 + 5) % n], axis=1),
            np.stack([ids, ids % 10], axis=1),
        ]
    )


class TestAnfHyperball:
    def test_estimates_track_exact_anf(self, ray_session):
        """HLL ANF estimates must track the exact BFS neighborhood
        function within HLL error (m=64 → σ≈13%; allow 3σ)."""
        from searchengine_ray.functions.graph import anf_hyperball

        n = 120
        edges = _gen_edges(n)
        got = anf_hyperball(edges, n, rounds=4)
        # exact N(r) by BFS from every node
        adj = [set() for _ in range(n)]
        for s, d in edges:
            if s != d:
                adj[int(s)].add(int(d))
                adj[int(d)].add(int(s))
        exact = []
        balls = [{v} for v in range(n)]
        exact.append(sum(len(b) for b in balls))
        for _ in range(4):
            balls = [
                b | set().union(*(adj[x] for x in b)) if b else b for b in balls
            ]
            exact.append(sum(len(b) for b in balls))
        est = got["est_micro_sum"].to_numpy(np.float64) / 1e6
        for r in range(5):
            assert abs(est[r] - exact[r]) / exact[r] < 0.4, (r, est[r], exact[r])
        # monotone in r
        assert (np.diff(est) >= 0).all()

    def test_ray_tier_matches_numpy_tier(self, ray_session):
        from searchengine_ray.functions.graph import anf_hyperball

        n = 90
        edges = _gen_edges(n)
        local = anf_hyperball(edges, n, rounds=3)
        dist = anf_hyperball(edges, n, rounds=3, dense_gate=0)
        pd.testing.assert_frame_equal(local, dist)

    def test_r0_is_singletons(self, ray_session):
        from searchengine_ray.functions.graph import anf_hyperball

        n = 64
        got = anf_hyperball(_gen_edges(n), n, rounds=1)
        # r=0: every ball is exactly {v}; HLL of a singleton estimates
        # near 1 (linear counting: 64·ln(64/63) ≈ 1.008)
        est0 = got["est_micro_sum"].iloc[0] / 1e6
        assert abs(est0 / n - 1.0) < 0.05


class TestSalsaScores:
    def _brute(self, edges, n, iters):
        packed = np.unique(
            edges[edges[:, 0] != edges[:, 1], 0] * (1 << 31)
            + edges[edges[:, 0] != edges[:, 1], 1]
        )
        src = (packed >> 31).astype(int)
        dst = (packed & ((1 << 31) - 1)).astype(int)
        din = np.bincount(dst, minlength=n)
        dout = np.bincount(src, minlength=n)
        a = np.ones(n)
        for _ in range(iters):
            h = np.zeros(n)
            for s, d in zip(src, dst):
                h[s] += a[d] / din[d]
            a = np.zeros(n)
            for s, d in zip(src, dst):
                a[d] += h[s] / dout[s]
        return a, h

    def test_matches_bruteforce(self, ray_session):
        from searchengine_ray.functions.graph import salsa_scores

        n = 80
        edges = _gen_edges(n)
        a, h = salsa_scores(edges, n, iters=5)
        wa, wh = self._brute(edges, n, 5)
        assert np.allclose(a, wa, rtol=1e-12, atol=1e-15)
        assert np.allclose(h, wh, rtol=1e-12, atol=1e-15)

    def test_ray_tier_matches_numpy_tier(self, ray_session):
        from searchengine_ray.functions.graph import salsa_scores

        n = 70
        edges = _gen_edges(n)
        la, lh = salsa_scores(edges, n, iters=4)
        da, dh = salsa_scores(edges, n, iters=4, dense_gate=0)
        assert np.allclose(la, da, rtol=1e-12, atol=1e-15)
        assert np.allclose(lh, dh, rtol=1e-12, atol=1e-15)

    def test_walk_mass_conserved(self, ray_session):
        """Each SALSA half-round redistributes the full score mass:
        Σh after a round equals Σa before it (walk conservation)."""
        from searchengine_ray.functions.graph import salsa_scores

        n = 50
        edges = _gen_edges(n)
        a1, h1 = salsa_scores(edges, n, iters=1)
        # h1 redistributes a0 ≡ 1 over nodes with in-links
        packed = np.unique(
            edges[edges[:, 0] != edges[:, 1], 0] * (1 << 31)
            + edges[edges[:, 0] != edges[:, 1], 1]
        )
        dst = packed & ((1 << 31) - 1)
        n_auth = len(set(dst.tolist()))
        assert np.isclose(h1.sum(), n_auth, rtol=1e-9)
        assert np.isclose(a1.sum(), h1.sum(), rtol=1e-9)
