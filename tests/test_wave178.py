"""Wave 178: 2-GMM EM + Hoeffding split — vs direct row-level
recomputation and EM guarantees."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestGmmEm:
    def test_em_monotone_and_valid(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_gmm_em

        got = q_gmm_em(sf_tiny)
        assert got["loglik_final_micro"].iloc[0] >= got["loglik_init_micro"].iloc[0]
        assert abs(got["pi"].sum() - 1.0) < 1e-6
        assert (got["var"] > 0).all()
        # component 1 initialized from the low Otsu class → lower mean
        assert got["mu"].iloc[0] < got["mu"].iloc[1]

    def test_matches_direct_em(self, ray_session, sf_tiny):
        """Row-level EM (no histogram grouping) with the same rounding
        schedule must converge to the same parameters — the histogram
        form is exact because responsibilities depend only on v."""
        from searchengine_ray.pipelines.queries import (
            GMM_ITERS,
            q_gmm_em,
            round_half_away,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["value"])
        x = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        S = int(x.sum())
        vals, cnts = np.unique(x, return_counts=True)
        # Otsu init on the histogram
        n0 = np.cumsum(cnts)
        s0 = np.cumsum(vals * cnts)
        best = None
        for i in range(len(vals) - 1):
            a, b = int(n0[i]), n - int(n0[i])
            num = (S * int(n0[i]) - n * int(s0[i])) ** 2 // (a * b)
            key = (-num, int(vals[i]))
            if best is None or key < best[0]:
                best = (key, i)
        i0 = best[1]
        mu = round_half_away(
            np.array([s0[i0] / n0[i0], (S - s0[i0]) / (n - n0[i0])]), 10
        )
        var_all = float(((x - S / n) ** 2).mean())
        var = round_half_away(np.array([var_all, var_all]), 10)
        pi = round_half_away(np.array([n0[i0] / n, (n - n0[i0]) / n]), 10)
        xf = x.astype(np.float64)
        for _ in range(GMM_ITERS):
            p1 = pi[0] * np.exp(-((xf - mu[0]) ** 2) / (2 * var[0])) / np.sqrt(
                2 * math.pi * var[0]
            )
            p2 = pi[1] * np.exp(-((xf - mu[1]) ** 2) / (2 * var[1])) / np.sqrt(
                2 * math.pi * var[1]
            )
            r2 = p2 / (p1 + p2)
            r1 = 1 - r2
            w1, w2 = r1.sum(), r2.sum()
            mu = round_half_away(
                np.array([(r1 * xf).sum() / w1, (r2 * xf).sum() / w2]), 10
            )
            var = round_half_away(
                np.array(
                    [
                        (r1 * (xf - mu[0]) ** 2).sum() / w1,
                        (r2 * (xf - mu[1]) ** 2).sum() / w2,
                    ]
                ),
                10,
            )
            pi = round_half_away(np.array([w1 / n, w2 / n]), 10)
        got = q_gmm_em(sf_tiny)
        assert np.allclose(got["mu"], np.round(mu, 6), atol=1e-4)
        assert np.allclose(got["pi"], np.round(pi, 6), atol=1e-6)
        assert np.allclose(got["var"], np.round(var, 6), atol=1e-2 * var.max())


class TestHoeffdingSplit:
    def test_matches_direct_gains(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            HOEFF_DELTA,
            HOEFF_WINDOWS,
            q_hoeffding_split,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        t0 = 1_704_067_200_000_000
        ts = ev["ts"].astype("int64")
        day = (ts - t0) // 86_400_000_000
        y = (ev["event_type"] == "click").astype(int).to_numpy()
        feats = {
            "hour12": ((ts // 3_600_000_000) % 24 < 12).astype(int).to_numpy(),
            "parity": (ev["user_id"] % 2).to_numpy(),
            "oddval": (np.rint(ev["value"].to_numpy() * 100).astype(np.int64) % 2),
        }

        def H(p):
            return (
                0.0
                if p <= 0 or p >= 1
                else -(p * math.log2(p) + (1 - p) * math.log2(1 - p))
            )

        got = q_hoeffding_split(sf_tiny).set_index("window_days")
        for w in HOEFF_WINDOWS:
            m = (day < w).to_numpy()
            n = int(m.sum())
            h0 = H(y[m].mean())
            gains = {}
            for fn, f in feats.items():
                cond = 0.0
                for br in (0, 1):
                    bm = m & (f == br)
                    if bm.sum() == 0:
                        continue
                    cond += bm.sum() / n * H(y[bm].mean())
                gains[fn] = h0 - cond
            ranked = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
            eps = math.sqrt(math.log(1 / HOEFF_DELTA) / (2 * n))
            row = got.loc[w]
            assert row["best_feature"] == ranked[0][0]
            assert abs(row["g_best"] - round(ranked[0][1], 6)) < 1e-9
            assert abs(row["epsilon"] - round(eps, 6)) < 1e-9
            assert row["split"] == (1 if ranked[0][1] - ranked[1][1] > eps else 0)
            assert row["n"] == n

    def test_epsilon_shrinks_with_n(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_hoeffding_split

        got = q_hoeffding_split(sf_tiny).sort_values("window_days")
        eps = got["epsilon"].to_numpy()
        assert (np.diff(eps) < 0).all()
