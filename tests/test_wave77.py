"""Brute-force identity tests for the graph/matching wave
(double-sweep diameter + Gale-Shapley, registry 351-352)."""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd


def _bfs(adj, s, n):
    d = [-1] * n
    d[s] = 0
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if d[v] < 0:
                d[v] = d[u] + 1
                q.append(v)
    return d


class TestGraphDiameter:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_graph_diameter

        n = len(pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"]))
        ids = np.arange(n)
        E = np.concatenate(
            [
                np.stack([ids, (ids * 5 + 1) % n], 1),
                np.stack([ids, (ids * ids * 3 + 2) % n], 1),
            ]
        )
        adj = [[] for _ in range(n)]
        for a, b in E:
            if a != b:
                adj[a].append(int(b))
                adj[b].append(int(a))
        d0 = _bfs(adj, 0, n)
        ecc0 = max(x for x in d0 if x >= 0)
        u = min(i for i in range(n) if d0[i] == ecc0)
        du = _bfs(adj, u, n)
        eccu = max(x for x in du if x >= 0)
        v = min(i for i in range(n) if du[i] == eccu)
        got = q_graph_diameter(sf_tiny).iloc[0]
        assert (got["seed"], got["ecc_seed"], got["far_u"]) == (0, ecc0, u)
        assert (got["diameter_lb"], got["far_v"]) == (eccu, v)
        assert got["n_reached"] == sum(1 for x in du if x >= 0)
        # double-sweep invariant
        assert got["diameter_lb"] >= got["ecc_seed"]


class TestStableMatching:
    @staticmethod
    def _market(sf):
        from searchengine_ray.pipelines.queries import STABLE_MOD, STABLE_N

        sup = (
            pd.read_parquet(f"{sf}/supplier.parquet", columns=["s_suppkey"])
            .sort_values("s_suppkey")["s_suppkey"]
            .to_numpy(np.int64)[:STABLE_N]
        )
        cus = (
            pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])
            .sort_values("c_custkey")["c_custkey"]
            .to_numpy(np.int64)[:STABLE_N]
        )
        kp = (sup[:, None] * 31 + cus[None, :] * 17) % STABLE_MOD
        ka = (cus[None, :] * 13 + sup[:, None] * 7) % STABLE_MOD
        return sup, cus, kp, ka

    def test_matches_sequential_gale_shapley(self, ray_session, sf_tiny):
        """Batch-round GS must produce the proposer-optimal matching,
        which equals textbook one-proposal-at-a-time GS."""
        from searchengine_ray.pipelines.queries import q_stable_matching

        sup, cus, kp, ka = self._market(sf_tiny)
        ns, nc = len(sup), len(cus)
        pref = np.argsort(kp.astype(np.int64) * 10**9 + cus[None, :], axis=1)
        ptr = [0] * ns
        hold = [-1] * nc
        free = deque(range(ns))
        while free:
            i = free.popleft()
            if ptr[i] >= nc:
                continue
            j = int(pref[i][ptr[i]])
            ptr[i] += 1
            if hold[j] < 0:
                hold[j] = i
            else:
                k = hold[j]
                if (ka[i, j], sup[i]) < (ka[k, j], sup[k]):
                    hold[j] = i
                    free.append(k)
                else:
                    free.append(i)
        exp = sorted(
            (int(sup[hold[j]]), int(cus[j])) for j in range(nc) if hold[j] >= 0
        )
        got = q_stable_matching(sf_tiny)
        assert list(zip(got["s_suppkey"], got["c_custkey"])) == exp

    def test_no_blocking_pair(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_stable_matching

        sup, cus, kp, ka = self._market(sf_tiny)
        got = q_stable_matching(sf_tiny)
        si = {int(k): x for x, k in enumerate(sup)}
        ci = {int(k): x for x, k in enumerate(cus)}
        match_s = {
            si[int(r["s_suppkey"])]: ci[int(r["c_custkey"])]
            for _, r in got.iterrows()
        }
        match_c = {v: k for k, v in match_s.items()}
        for i in range(len(sup)):
            for j in range(len(cus)):
                if match_s[i] == j:
                    continue
                s_prefers = (kp[i, j], cus[j]) < (
                    kp[i, match_s[i]],
                    cus[match_s[i]],
                )
                if j not in match_c:
                    # an unmatched customer accepts anyone: stability
                    # requires no supplier prefer j to their match
                    assert not s_prefers, (i, j)
                    continue
                c_prefers = (ka[i, j], sup[i]) < (
                    ka[match_c[j], j],
                    sup[match_c[j]],
                )
                assert not (s_prefers and c_prefers), (i, j)

    def test_rank_columns(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_stable_matching

        sup, cus, _, _ = self._market(sf_tiny)
        got = q_stable_matching(sf_tiny)
        # every proposer matches in a complete rectangular market
        assert len(got) == min(len(sup), len(cus))
        assert got["s_rank"].between(1, len(cus)).all()
        assert got["c_rank"].between(1, len(sup)).all()
        assert got["c_custkey"].is_unique
        assert got["s_suppkey"].is_unique
