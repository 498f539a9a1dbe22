"""Brute-force identity tests for the sampling/prefetch wave
(Neyman allocation, successor prefetch; registry 475-476)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestNeymanAlloc:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import NEYMAN_BUDGET, q_neyman_alloc

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["n_chars", "source"]
        )
        g = docs.groupby("source")["n_chars"]
        N = g.size()
        S = g.apply(lambda s: float(np.std(s.to_numpy(float))))
        denom = (N * S).sum()
        got = q_neyman_alloc(sf_tiny).set_index("source")
        for s in N.index:
            row = got.loc[s]
            assert row["N"] == N[s]
            assert abs(row["S"] - S[s]) < 1e-5
            assert abs(row["neyman_n"] - NEYMAN_BUDGET * N[s] * S[s] / denom) < 1e-4
            assert abs(row["prop_n"] - NEYMAN_BUDGET * N[s] / N.sum()) < 1e-5

    def test_neyman_never_worse(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import NEYMAN_BUDGET, q_neyman_alloc

        got = q_neyman_alloc(sf_tiny)
        # the optimality theorem: Neyman variance <= proportional variance
        assert got["v_neyman"].iloc[0] <= got["v_prop"].iloc[0] + 1e-9
        # both allocations spend the budget
        assert abs(got["neyman_n"].sum() - NEYMAN_BUDGET) < 1e-3
        assert abs(got["prop_n"].sum() - NEYMAN_BUDGET) < 1e-3


class TestSuccessorPrefetch:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_successor_prefetch

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet",
            columns=["ts", "user_id", "event_id", "event_type"],
        )
        ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
        trans: dict[tuple, int] = {}
        for _, g in ev.groupby("user_id"):
            g = g.sort_values(["t", "event_id"])
            evs = g["event_type"].tolist()
            for a, b in zip(evs, evs[1:]):
                trans[(a, b)] = trans.get((a, b), 0) + 1
        got = q_successor_prefetch(sf_tiny).set_index("state")
        for src in sorted({k[0] for k in trans}):
            succ = {d: n for (s, d), n in trans.items() if s == src}
            pred = sorted(succ.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            row = got.loc[src]
            assert row["n_trans"] == sum(succ.values())
            assert row["predicted"] == pred
            assert row["hits"] == succ[pred]
            assert abs(row["hit_rate"] - succ[pred] / sum(succ.values())) < 1e-6

    def test_hit_rate_at_least_uniform(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_successor_prefetch

        got = q_successor_prefetch(sf_tiny)
        # argmax prediction always beats a uniform guess over 5 types
        assert (got["hit_rate"] >= 1.0 / 5 - 0.05).all()
        assert (got["hits"] <= got["n_trans"]).all()
