"""Brute-force identity tests for the time-series diagnostics wave
(registry 299-300: Hurst R/S exponent, partial autocorrelation)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


def _daily_counts(sf_dir: str) -> np.ndarray:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    day = (
        ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    ).astype(int)
    return day.value_counts().sort_index().to_numpy(np.int64)


class TestHurstExponent:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            HURST_WINDOWS,
            q_hurst_exponent,
        )

        x = _daily_counts(sf_tiny)
        got = q_hurst_exponent(sf_tiny)
        assert list(got["window_n"]) == list(HURST_WINDOWS)
        lnn, lnrs = [], []
        for wn, row in zip(HURST_WINDOWS, got.itertuples()):
            nch = len(x) // wn
            assert row.n_chunks == nch
            rss = []
            for ck in range(nch):
                ch = x[ck * wn : (ck + 1) * wn].astype(np.float64)
                z = np.cumsum(ch - ch.mean())
                r = z.max() - z.min()
                s = ch.std()  # population
                rss.append(r / s)
            mean_rs = float(np.mean(np.round(np.asarray(rss), 6)))
            assert row.mean_rs == pytest.approx(mean_rs, abs=2e-6)
            lnn.append(math.log(wn))
            lnrs.append(math.log(mean_rs))
        slope = np.polyfit(lnn, lnrs, 1)[0]
        assert got["hurst"].iloc[0] == pytest.approx(slope, abs=1e-4)

    def test_hurst_plausible(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_hurst_exponent

        got = q_hurst_exponent(sf_tiny)
        h = got["hurst"].iloc[0]
        assert 0.0 < h < 1.2  # R/S estimates can mildly exceed 1 on tiny series
        assert got["hurst"].nunique() == 1
        assert (got["mean_rs"] > 0).all()


class TestPacfDaily:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import PACF_K, q_pacf_daily

        x = _daily_counts(sf_tiny).astype(np.float64)
        d = len(x)
        m = x.mean()
        den = float(((x - m) ** 2).sum())
        r = np.array(
            [
                float(((x[:-k] - m) * (x[k:] - m)).sum()) / den
                for k in range(1, PACF_K + 1)
            ]
        )
        # Durbin–Levinson reference implementation
        phi = np.zeros((PACF_K + 1, PACF_K + 1))
        v = 1.0 - r[0] * r[0]
        phi[1, 1] = r[0]
        pac = [r[0]]
        for k in range(2, PACF_K + 1):
            num = r[k - 1] - sum(phi[k - 1, j] * r[k - 1 - j] for j in range(1, k))
            a = num / v
            phi[k, k] = a
            for j in range(1, k):
                phi[k, j] = phi[k - 1, j] - a * phi[k - 1, k - j]
            v *= 1.0 - a * a
            pac.append(a)
        got = q_pacf_daily(sf_tiny)
        assert list(got["lag"]) == list(range(1, PACF_K + 1))
        np.testing.assert_allclose(got["acf"], np.round(r, 6), atol=2e-6)
        np.testing.assert_allclose(got["pacf"], np.round(pac, 6), atol=2e-6)

    def test_pacf_lag1_equals_acf1(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_pacf_daily

        got = q_pacf_daily(sf_tiny)
        assert got["pacf"].iloc[0] == got["acf"].iloc[0]
        assert (got["acf"].abs() <= 1.0).all()
