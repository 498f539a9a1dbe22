"""Brute-force identity tests for the Lorenz-curve and absorbing-Markov
wave (registry 287-288)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestLorenzCurve:
    def test_matches_pandas_cumshare(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_lorenz_curve

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["user_id", "event_type", "value"]
        )
        milli = np.where(
            ev["event_type"].to_numpy() == "purchase",
            np.round(np.round(ev["value"].to_numpy(), 3) * 1e3).astype(np.int64),
            0,
        )
        per = (
            pd.DataFrame({"user_id": ev["user_id"], "m": milli})
            .groupby("user_id")["m"]
            .sum()
            .reset_index()
            .sort_values(["m", "user_id"])
        )
        m = per["m"].to_numpy(np.int64)
        cum = np.cumsum(m)
        total = m.sum()
        got = q_lorenz_curve(sf_tiny)
        assert list(got["decile"]) == list(range(1, 11))
        for _, r in got.iterrows():
            k = (int(r["decile"]) * len(m) + 9) // 10
            assert int(r["n_users"]) == k
            assert int(r["cum_milli"]) == int(cum[k - 1])
            assert abs(r["lorenz"] - cum[k - 1] / total) < 1e-5

    def test_curve_properties(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_lorenz_curve

        got = q_lorenz_curve(sf_tiny)
        lz = got["lorenz"].to_numpy()
        # monotone nondecreasing, ends at 1, below the diagonal
        assert (np.diff(lz) >= -1e-12).all()
        assert abs(lz[-1] - 1.0) < 1e-9
        assert (lz <= got["decile"].to_numpy() / 10 + 1e-9).all()


class TestAbsorbingMarkov:
    def test_matches_dense_recursion(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            MARKOV_HORIZON,
            q_absorbing_markov,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        nxt = ev.groupby("user_id", sort=False)["event_type"].shift(-1)
        ok = nxt.notna()
        pairs = pd.DataFrame({"f": ev["event_type"][ok], "t": nxt[ok]})
        states = sorted(set(pairs["f"]).union(pairs["t"]))
        idx = {s: i for i, s in enumerate(states)}
        A = len(states)
        C = np.zeros((A, A), np.int64)
        for (f, t), n in pairs.groupby(["f", "t"]).size().items():
            C[idx[f], idx[t]] = n
        P = C / C.sum(axis=1, keepdims=True)
        pur = idx["purchase"]
        reach = np.zeros(A)
        for _ in range(MARKOV_HORIZON):
            target = np.where(np.arange(A) == pur, 1.0, reach)
            reach = P @ target
        got = q_absorbing_markov(sf_tiny).set_index("event_type")
        for s in states:
            assert int(got.loc[s, "n_out"]) == int(C[idx[s]].sum())
            assert abs(got.loc[s, "p_reach_purchase"] - reach[idx[s]]) < 1e-5

    def test_probabilities_bounded(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_absorbing_markov

        got = q_absorbing_markov(sf_tiny)
        p = got["p_reach_purchase"].to_numpy()
        assert ((p >= 0) & (p <= 1)).all()
        assert len(got) == 5
