"""Wave 188: effective resistance + exponential survival — vs known
circuit identities, Laplacian pseudoinverse and lifelines-free KM."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestEffectiveResistance:
    def test_circuit_identities(self):
        from searchengine_ray.pipelines.queries import _bareiss_det

        def reff(edges, n, u, v):
            def lap(es, nn):
                L = [[0] * nn for _ in range(nn)]
                for a, b in es:
                    L[a][a] += 1
                    L[b][b] += 1
                    L[a][b] -= 1
                    L[b][a] -= 1
                return L

            den, _ = _bareiss_det([r[1:] for r in lap(edges, n)[1:]])
            relabel = {}
            nxt = 0
            for x in range(n):
                if x == v:
                    continue
                relabel[x] = nxt
                nxt += 1
            relabel[v] = relabel[u]
            ces = [
                (relabel[a], relabel[b])
                for a, b in edges
                if relabel[a] != relabel[b]
            ]
            num, _ = _bareiss_det([r[1:] for r in lap(ces, n - 1)[1:]])
            return num, den

        # series: path 0-1-2 → R(0,2) = 2
        num, den = reff([(0, 1), (1, 2)], 3, 0, 2)
        assert num * 1 == 2 * den
        # parallel: double edge 0-1 → R = 1/2
        num, den = reff([(0, 1), (0, 1)], 2, 0, 1)
        assert 2 * num == den
        # triangle: R between adjacent nodes = 2/3
        num, den = reff([(0, 1), (1, 2), (0, 2)], 3, 0, 1)
        assert 3 * num == 2 * den

    def test_matches_laplacian_pinv(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            ER_DST,
            ER_SRC,
            SPT_N,
            q_effective_resistance,
        )

        got = q_effective_resistance(sf_tiny)
        m = SPT_N
        ii = np.arange(m)
        edges = np.concatenate(
            [
                np.stack([ii, (ii * 7 + 13) % m], axis=1),
                np.stack([ii, (ii * 31 + 5) % m], axis=1),
                np.stack([ii, ii % 5], axis=1),
            ]
        )
        keep = edges[:, 0] != edges[:, 1]
        packed = np.unique(
            np.minimum(edges[keep, 0], edges[keep, 1]) * (1 << 31)
            + np.maximum(edges[keep, 0], edges[keep, 1])
        )
        u = (packed >> 31).astype(int)
        v = (packed & ((1 << 31) - 1)).astype(int)
        L = np.zeros((m, m))
        for a, b in zip(u, v):
            L[a, a] += 1
            L[b, b] += 1
            L[a, b] -= 1
            L[b, a] -= 1
        Lp = np.linalg.pinv(L)
        r = Lp[ER_SRC, ER_SRC] + Lp[ER_DST, ER_DST] - 2 * Lp[ER_SRC, ER_DST]
        got_r = got["num_trees_contracted"].iloc[0] / got["den_trees"].iloc[0]
        assert abs(got_r - r) < 1e-9
        assert got["r_eff_micro"].iloc[0] == got["num_trees_contracted"].iloc[0] * 10**6 // got["den_trees"].iloc[0]


class TestExpSurvival:
    def test_matches_direct_mle_and_km(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_exp_survival, round_half_away

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        ev["a"] = ev["ts"].astype("int64")
        tmax = int(ev["a"].max())
        rows = []
        for uid, g in ev.groupby("user_id"):
            first = int(g["a"].min())
            errs = g.loc[g["event_type"] == "error", "a"]
            if len(errs):
                rows.append((int(errs.min()) - first, 1))
            else:
                rows.append((tmax - first, 0))
        df = pd.DataFrame(rows, columns=["t", "e"])
        got = q_exp_survival(sf_tiny)
        d = int(df["e"].sum())
        T = int(df["t"].sum())
        assert got["n_subjects"].iloc[0] == len(df)
        assert got["n_events"].iloc[0] == d
        assert got["total_time_us"].iloc[0] == T
        assert got["exp_median_us"].iloc[0] == int(
            np.rint(round_half_away(T * math.log(2) / d, 0))
        )
        # KM median: S drops below 1/2 at the returned time
        g2 = df.groupby("t").agg(d=("e", "sum"), n=("e", "size")).reset_index()
        n_risk = len(df)
        S = 1.0
        km = -1
        for r in g2.itertuples():
            if r.d > 0:
                S *= max(1 - r.d / n_risk, 1e-15)
                if km < 0 and S <= 0.5 + 1e-12:
                    km = int(r.t)
            n_risk -= int(r.n)
        assert got["km_median_us"].iloc[0] == km

    def test_medians_same_scale(self, ray_session, sf_small):
        from searchengine_ray.pipelines.queries import q_exp_survival

        got = q_exp_survival(sf_small)
        if got["km_median_us"].iloc[0] > 0:
            ratio = got["exp_median_us"].iloc[0] / got["km_median_us"].iloc[0]
            assert 0.2 < ratio < 5.0
