"""Brute-force identity tests for the PAVA/stylometry wave
(registry 307-308: isotonic_calibration, burrows_delta)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestIsotonicCalibration:
    def test_matches_sklearn_style_pava(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_isotonic_calibration

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type"])
        day = (
            ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        ).astype(int)
        g = pd.DataFrame({"day": day, "p": (ev["event_type"] == "purchase")})
        daily = g.groupby("day").agg(w=("p", "size"), v=("p", "sum")).reset_index()
        # reference PAVA on float rates with weights (independent impl)
        y = (daily["v"] / daily["w"]).to_numpy(np.float64)
        w = daily["w"].to_numpy(np.float64)
        blocks = [[y[i] * w[i], w[i], 1] for i in range(len(y))]
        out = []
        for b in blocks:
            out.append(b)
            while len(out) >= 2 and out[-1][0] / out[-1][1] < out[-2][0] / out[-2][1]:
                s, ww, c = out.pop()
                out[-1][0] += s
                out[-1][1] += ww
                out[-1][2] += c
        fitted = np.concatenate(
            [np.full(int(c), s / ww) for s, ww, c in out]
        )
        got = q_isotonic_calibration(sf_tiny)
        assert list(got["day"]) == list(daily["day"])
        assert list(got["events"]) == list(daily["w"])
        assert list(got["purchases"]) == list(daily["v"])
        np.testing.assert_allclose(got["fitted"], fitted, atol=2e-6)

    def test_fit_is_monotone_and_mean_preserving(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_isotonic_calibration

        got = q_isotonic_calibration(sf_tiny)
        f = got["fitted"].to_numpy()
        assert (np.diff(f) >= -1e-9).all()  # nondecreasing
        # within each pool the weighted mean of raw rates equals the fit
        for _, g in got.groupby("pool"):
            rate = g["purchases"].sum() / g["events"].sum()
            assert g["fitted"].iloc[0] == pytest.approx(rate, abs=1e-6)
        # pools are maximal: consecutive pool means strictly increase
        pm = got.groupby("pool")["fitted"].first().to_numpy()
        assert (np.diff(pm) > 0).all()


class TestBurrowsDelta:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import (
            BURROWS_PAIRS,
            BURROWS_TOPK,
            q_burrows_delta,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "text"])
        counts: dict[tuple, int] = {}
        src_tot: dict[str, int] = {}
        term_tot: dict[str, int] = {}
        for s, ts in zip(docs["source"], _token_lists(docs["text"])):
            for t in ts:
                counts[(s, t)] = counts.get((s, t), 0) + 1
                src_tot[s] = src_tot.get(s, 0) + 1
                term_tot[t] = term_tot.get(t, 0) + 1
        top = sorted(term_tot, key=lambda t: (-term_tot[t], t))[:BURROWS_TOPK]
        sources = sorted(src_tot)
        fq = np.array(
            [
                [
                    round(counts.get((s, t), 0) / src_tot[s] * 1e9)
                    for t in top
                ]
                for s in sources
            ],
            np.int64,
        )
        n = len(sources)
        mean = fq.sum(axis=0) / 1e9 / n
        var = (fq.astype(np.float64) ** 2).sum(axis=0) / 1e18 / n - mean**2
        z = (fq / 1e9 - mean) / np.sqrt(var)
        rows = []
        for a in range(n):
            for b in range(a + 1, n):
                s = int(np.round(np.abs(z[a] - z[b]) * 1e6).sum())
                rows.append((sources[a], sources[b], s / 1e6 / BURROWS_TOPK))
        rows.sort(key=lambda r: (r[2], r[0], r[1]))
        want = rows[:BURROWS_PAIRS]
        got = q_burrows_delta(sf_tiny)
        assert len(got) == len(want)
        for (sa, sb, d), row in zip(want, got.itertuples()):
            assert (row.src_a, row.src_b) == (sa, sb)
            assert row.delta == pytest.approx(d, abs=2e-6)

    def test_delta_properties(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_burrows_delta

        got = q_burrows_delta(sf_tiny)
        assert (got["delta"] >= 0).all()
        assert (np.diff(got["delta"].to_numpy()) >= -1e-9).all()
        assert (got["src_a"] < got["src_b"]).all()
