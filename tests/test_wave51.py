"""Brute-force identity tests for the entity-resolution / LPT-rebalance
wave (registry 297-298)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _lev(a: str, b: str) -> int:
    if not a or not b:
        return max(len(a), len(b))
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(cur[-1] + 1, prev[j] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


class TestEntityResolution:
    def test_matches_networkless_closure(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            ER_LEV_T,
            ER_WINDOW,
            q_entity_resolution,
        )

        parts = pd.read_parquet(f"{sf_tiny}/part.parquet", columns=["p_name"])
        counts = parts["p_name"].value_counts()
        ns = sorted(counts.index)
        # adjacency from the sorted-neighborhood window, then BFS closure
        adj: dict[int, set] = {i: set() for i in range(len(ns))}
        for off in range(1, ER_WINDOW):
            for i in range(len(ns) - off):
                if _lev(ns[i], ns[i + off]) <= ER_LEV_T:
                    adj[i].add(i + off)
                    adj[i + off].add(i)
        label = [-1] * len(ns)
        for s in range(len(ns)):
            if label[s] >= 0:
                continue
            stack, comp = [s], []
            label[s] = s
            while stack:
                u = stack.pop()
                comp.append(u)
                for v in adj[u]:
                    if label[v] < 0:
                        label[v] = s
                        stack.append(v)
        clusters: dict[str, list[str]] = {}
        for i, n in enumerate(ns):
            clusters.setdefault(ns[label[i]], []).append(n)
        got = q_entity_resolution(sf_tiny).set_index("cluster")
        assert len(got) == len(clusters)
        for rep, members in clusters.items():
            r = got.loc[rep]
            assert int(r["n_names"]) == len(members)
            assert int(r["n_parts"]) == int(sum(counts[m] for m in members))

    def test_merges_happen(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_entity_resolution

        got = q_entity_resolution(sf_tiny)
        assert (got["n_names"] > 1).any(), "corpus should produce >=1 merged entity"


class TestShardRebalance:
    def test_matches_greedy_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            REBALANCE_NODES,
            q_shard_rebalance,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "n_chars"])
        sz = (
            docs.groupby("source")["n_chars"]
            .sum()
            .reset_index()
            .sort_values(["n_chars", "source"], ascending=[False, True])
        )
        loads = [0] * REBALANCE_NODES
        cnts = [0] * REBALANCE_NODES
        for s in sz["n_chars"]:
            p = loads.index(min(loads))
            loads[p] += int(s)
            cnts[p] += 1
        got = q_shard_rebalance(sf_tiny)
        assert got["load"].tolist() == loads
        assert got["n_shards"].tolist() == cnts
        total = sum(loads)
        for _, r in got.iterrows():
            assert abs(r["balance"] - r["load"] / (total / REBALANCE_NODES)) < 1e-5

    def test_lpt_bound(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_shard_rebalance

        got = q_shard_rebalance(sf_tiny)
        # LPT guarantees makespan <= 4/3 OPT; OPT >= perfect split, so
        # normalized max load must stay under 4/3 (loose but real bound)
        assert got["balance"].max() <= 4.0 / 3.0 + 1e-9
        assert got["n_shards"].sum() == 20
