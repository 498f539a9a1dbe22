"""Wave 196: priority sampling + RANSAC — vs direct replay and
estimator/robustness guarantees."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestPrioritySampling:
    def test_matches_direct_sample(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PRI_K,
            _md5_low64,
            q_priority_sampling,
            round_half_away,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        p = ev[ev["event_type"] == "purchase"]
        w = np.rint(p["value"].to_numpy() * 100).astype(np.int64)
        eid = p["event_id"].to_numpy(np.int64)
        hour = (p["ts"].astype("int64").to_numpy() // 3_600_000_000) % 24
        U = np.array([_md5_low64(f"pri#{e}") % (1 << 53) + 1 for e in eid], np.int64)
        qf = w.astype(np.float64) * (1 << 53) / U
        order = np.lexsort((eid, -qf))
        keep = order[:PRI_K]
        tau = float(qf[order[PRI_K]])
        est_micro = np.rint(
            round_half_away(np.maximum(w[keep].astype(float), tau), 6) * 1e6
        ).astype(np.int64)
        got = q_priority_sampling(sf_tiny).set_index("hour_band")
        for h in range(0, 24, 3):
            hm = (hour >= h) & (hour < h + 3)
            assert got.loc[h, "exact_sum"] == int(w[hm].sum())
            assert got.loc[h, "est_sum_micro"] == int(est_micro[hm[keep]].sum())

    def test_estimates_track_exact(self, ray_session, sf_small):
        """Priority sampling is unbiased; with k=100 of ~2k items the
        band estimates should land within ~50% of truth."""
        from searchengine_ray.pipelines.queries import q_priority_sampling

        got = q_priority_sampling(sf_small)
        est = got["est_sum_micro"].to_numpy(np.float64) / 1e6
        exact = got["exact_sum"].to_numpy(np.float64)
        assert abs(est.sum() - exact.sum()) / exact.sum() < 0.2
        assert (got["n_in_sample"].sum()) == 100


class TestRansacLine:
    def test_matches_direct_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            RANSAC_EPS,
            RANSAC_TRIALS,
            _md5_low64,
            q_ransac_line,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        p = ev[ev["event_type"] == "purchase"].copy()
        p["day"] = p["ts"].astype("int64") // 86_400_000_000
        p["c"] = np.rint(p["value"].to_numpy() * 100).astype(np.int64)
        daily = p.groupby("day")["c"].sum().sort_index()
        x = (daily.index - daily.index.min()).to_numpy(np.int64)
        y = daily.to_numpy(np.int64)
        n = len(x)
        best = None
        for t in range(RANSAC_TRIALS):
            i = _md5_low64(f"ra#{t}#a") % n
            j = _md5_low64(f"ra#{t}#b") % n
            if i == j or x[j] == x[i]:
                continue
            dx, dy = int(x[j] - x[i]), int(y[j] - y[i])
            inl = np.abs(dy * (x - x[i]) - dx * (y - y[i])) <= RANSAC_EPS * abs(dx)
            key = (-int(inl.sum()), t)
            if best is None or key < best[0]:
                best = (key, t, inl)
        got = q_ransac_line(sf_tiny)
        assert got["best_trial"].iloc[0] == best[1]
        assert got["n_inliers"].iloc[0] == int(best[2].sum())

    def test_robust_to_planted_outlier(self):
        """RANSAC's defining property on synthetic data: one wild
        outlier must not drag the fitted slope, while OLS moves."""
        rng = np.random.RandomState(2)
        x = np.arange(30, dtype=np.int64)
        y = (100 * x + 50 + rng.randint(-40, 41, 30)).astype(np.int64)
        y_out = y.copy()
        y_out[15] += 100_000
        eps = 100

        def ransac_slope(xx, yy):
            best = None
            for t in range(64):
                i, j = (t * 7) % 30, (t * 11 + 3) % 30
                if i == j:
                    continue
                dx, dy = int(xx[j] - xx[i]), int(yy[j] - yy[i])
                if dx == 0:
                    continue
                inl = np.abs(dy * (xx - xx[i]) - dx * (yy - yy[i])) <= eps * abs(dx)
                key = (-int(inl.sum()), t)
                if best is None or key < best[0]:
                    best = (key, inl)
            inl = best[1]
            m = inl.sum()
            sx, sy = xx[inl].sum(), yy[inl].sum()
            sxx = (xx[inl] * xx[inl]).sum()
            sxy = (xx[inl] * yy[inl]).sum()
            return (m * sxy - sx * sy) / (m * sxx - sx * sx)

        s_clean = ransac_slope(x, y)
        s_out = ransac_slope(x, y_out)
        ols_out = np.polyfit(x.astype(float), y_out.astype(float), 1)[0]
        assert abs(s_out - s_clean) < 5
        assert abs(ols_out - 100) > 10  # OLS dragged (~23 here), RANSAC not
