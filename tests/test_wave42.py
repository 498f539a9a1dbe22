"""Brute-force identity tests for the Hill / modularity / runs-test
wave (registry 276-278)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestHillTail:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import HILL_KS, q_hill_tail

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["event_type", "value"])
        v = np.round(ev.loc[ev["event_type"] == "purchase", "value"].to_numpy(np.float64), 3)
        milli = (np.floor(np.abs(v * 1e3) + 0.5) * np.sign(v * 1e3)).astype(np.int64)
        top = np.sort(milli)[::-1]
        got = q_hill_tail(sf_tiny).set_index("k")
        for k in HILL_KS:
            inv = float(np.log(top[:k] / top[k]).mean())
            assert abs(got.loc[k, "hill_inv"] - inv) < 1e-6
            assert abs(got.loc[k, "alpha"] - 1.0 / inv) < 1e-4


class TestModularity:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_modularity_score

        n = len(pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"]))
        ids = np.arange(n)
        e = np.concatenate(
            [
                np.stack([ids, (ids * 7 + 13) % n], axis=1),
                np.stack([ids, (ids * 31 + 5) % n], axis=1),
                np.stack([ids, ids % 10], axis=1),
            ]
        )
        e = e[e[:, 0] != e[:, 1]]
        und = {(min(a, b), max(a, b)) for a, b in e.tolist()}
        deg = {}
        e_in = {}
        for u, v in und:
            deg[u % 10] = deg.get(u % 10, 0) + 1
            deg[v % 10] = deg.get(v % 10, 0) + 1
            if u % 10 == v % 10:
                e_in[u % 10] = e_in.get(u % 10, 0) + 1
        M = len(und)
        q = sum(
            e_in.get(c, 0) / M - (deg.get(c, 0) / (2 * M)) ** 2 for c in range(10)
        )
        got = q_modularity_score(sf_tiny).set_index("comm")
        for c in range(10):
            assert int(got.loc[c, "degree_sum"]) == deg.get(c, 0)
            assert int(got.loc[c, "internal_edges"]) == e_in.get(c, 0)
        assert abs(got["modularity"].iloc[0] - q) < 1e-6
        assert -1.0 <= got["modularity"].iloc[0] <= 1.0


class TestRunsTest:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_runs_test

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts"])
        day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy(np.int64)
        vc = pd.Series(day).value_counts().sort_index()
        c = vc.to_numpy(np.int64)
        med = int(np.sort(c)[(len(c) + 1) // 2 - 1])
        sign = c[c != med] > med
        n_pos, n_neg = int(sign.sum()), int((~sign).sum())
        runs = int(1 + (sign[1:] != sign[:-1]).sum())
        N = n_pos + n_neg
        mu = 2 * n_pos * n_neg / N + 1
        var = 2 * n_pos * n_neg * (2 * n_pos * n_neg - N) / (N * N * (N - 1))
        z = (runs - mu) / math.sqrt(var)
        got = q_runs_test(sf_tiny)
        assert int(got["n_pos"].iloc[0]) == n_pos
        assert int(got["n_neg"].iloc[0]) == n_neg
        assert int(got["runs"].iloc[0]) == runs
        assert abs(got["z"].iloc[0] - z) < 1e-6
