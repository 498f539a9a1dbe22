"""Brute-force identity tests for the DBSCAN / MMR / Kendall-tau /
forecast-MASE wave (registry 245-248)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _emb_matrix(sf: str):
    t = pd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(np.int64)
    X = np.stack([np.asarray(v, np.float64) for v in t["embedding"]])
    order = np.argsort(ids)
    return ids[order], X[order]


class TestDbscan:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            DBSCAN_MINPTS,
            DBSCAN_SIM_T,
            q_dbscan_clusters,
        )

        ids, X = _emb_matrix(sf_tiny)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = Xn @ Xn.T
        np.fill_diagonal(S, -1)
        adj = S >= DBSCAN_SIM_T
        deg = adj.sum(1)
        core = deg >= DBSCAN_MINPTS
        # brute components over core-core edges
        n = len(ids)
        comp = np.arange(n)
        for _ in range(n):
            changed = False
            for i in range(n):
                if not core[i]:
                    continue
                for j in np.flatnonzero(adj[i] & core):
                    m = min(comp[i], comp[j])
                    if comp[i] != m or comp[j] != m:
                        comp[i] = comp[j] = m
                        changed = True
            if not changed:
                break
        clusters: dict[int, list[int]] = {}
        core_lbl = {}
        for i in np.flatnonzero(core):
            root = comp[i]
            clusters.setdefault(root, []).append(i)
        label_of_root = {r: int(ids[min(m)]) for r, m in clusters.items()}
        expect: dict[int, list[int]] = {}
        for r, members in clusters.items():
            expect[label_of_root[r]] = [len(members), 0]
        for i in np.flatnonzero(~core):
            nbr_cores = np.flatnonzero(adj[i] & core)
            if len(nbr_cores):
                cl = min(label_of_root[comp[j]] for j in nbr_cores)
                expect[cl][1] += 1
        got = q_dbscan_clusters(sf_tiny)
        exp_df = pd.DataFrame(
            [(k, v[0], v[1]) for k, v in sorted(expect.items())],
            columns=["cluster", "n_core", "n_border"],
        ).astype({"cluster": "int64", "n_core": "int64", "n_border": "int64"})
        pd.testing.assert_frame_equal(got, exp_df)


class TestMmr:
    def test_matches_greedy_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            MMR_K,
            MMR_LAMBDA,
            MMR_POOL,
            q_mmr_diversify,
        )

        ids, X = _emb_matrix(sf_tiny)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        q = Xn[ids == 0][0]
        rel_all = np.round(Xn @ q, 6)
        order = np.lexsort((ids, -rel_all))[:MMR_POOL]
        pool_ids = ids[order]
        rel = rel_all[order]
        sims = np.round(Xn[order] @ Xn[order].T, 6)
        chosen = []
        expect = []
        avail = np.ones(MMR_POOL, bool)
        for rank in range(1, MMR_K + 1):
            pen = sims[:, chosen].max(axis=1) if chosen else np.zeros(MMR_POOL)
            score = MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * pen
            score[~avail] = -np.inf
            cands = np.flatnonzero(score == score.max())
            best = min(cands, key=lambda i: pool_ids[i])
            expect.append((rank, int(pool_ids[best]), round(float(score[best]), 6)))
            chosen.append(best)
            avail[best] = False
        got = q_mmr_diversify(sf_tiny)
        assert [(int(r.rank), int(r.vec_id)) for r in got.itertuples()] == [
            (a, b) for a, b, _ in expect
        ]
        np.testing.assert_allclose(
            got["mmr"].to_numpy(), [s for *_, s in expect], atol=1e-6
        )
        # diversity property: MMR must not just repeat the cosine top-k
        assert len(set(got["vec_id"])) == MMR_K


class TestKendallTau:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_kendall_tau

        c = pd.read_parquet(f"{sf_tiny}/customer.parquet", columns=["c_nationkey", "c_acctbal"])
        s = pd.read_parquet(f"{sf_tiny}/supplier.parquet", columns=["s_nationkey"])
        nat = pd.read_parquet(f"{sf_tiny}/nation.parquet", columns=["n_nationkey"])
        bal = np.round(c["c_acctbal"].to_numpy(np.float64), 2)
        c = c.assign(cents=(np.floor(np.abs(bal * 100) + 0.5) * np.sign(bal * 100)).astype(np.int64))
        x = c.groupby("c_nationkey")["cents"].sum()
        y = s.groupby("s_nationkey").size()
        keys = sorted(nat["n_nationkey"].astype(int))
        xv = np.asarray([int(x.get(k, 0)) for k in keys])
        yv = np.asarray([int(y.get(k, 0)) for k in keys])
        n = len(keys)
        conc = disc = 0
        for i in range(n):
            for j in range(i + 1, n):
                p = np.sign(xv[i] - xv[j]) * np.sign(yv[i] - yv[j])
                conc += p > 0
                disc += p < 0
        n0 = n * (n - 1) // 2
        n1 = sum(v * (v - 1) // 2 for v in pd.Series(xv).value_counts())
        n2 = sum(v * (v - 1) // 2 for v in pd.Series(yv).value_counts())
        tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
        got = q_kendall_tau(sf_tiny)
        assert int(got["n"].iloc[0]) == n
        assert int(got["concordant"].iloc[0]) == conc
        assert int(got["discordant"].iloc[0]) == disc
        assert abs(got["tau_b"].iloc[0] - tau) < 1e-6
        assert -1.0 <= got["tau_b"].iloc[0] <= 1.0


class TestForecastMase:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_forecast_mase

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type"])
        p = ev[ev["event_type"] == "purchase"]
        day = (p["ts"].astype("int64") // 86_400_000_000).to_numpy(np.int64)
        cnt = pd.Series(day).value_counts().to_dict()
        e7 = [abs(cnt[d] - cnt[d - 7]) for d in cnt if d - 7 in cnt]
        e1 = [abs(cnt[d] - cnt[d - 1]) for d in cnt if d - 1 in cnt]
        got = q_forecast_mase(sf_tiny)
        assert int(got["n_days"].iloc[0]) == len(cnt)
        assert abs(got["mae_seasonal"].iloc[0] - np.mean(e7)) < 1e-6
        assert abs(got["mae_naive"].iloc[0] - np.mean(e1)) < 1e-6
        assert abs(
            got["mase"].iloc[0] - got["mae_seasonal"].iloc[0] / got["mae_naive"].iloc[0]
        ) < 1e-5
