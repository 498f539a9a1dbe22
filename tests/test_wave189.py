"""Wave 189: GreedyDual-Size + bow-tie decomposition — vs sequential
replay and partition invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestGreedyDualSize:
    def test_matches_sequential_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            GDS_CAP,
            GDS_REQS,
            q_greedydual_size,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_id", "user_id"])
        ev = ev.sort_values(["ts", "event_id"]).head(GDS_REQS)
        objs = ev["user_id"].astype(int).tolist()

        def size_of(o):
            return 50 + o % 200

        cache, used, L, hits, evs = {}, 0, 0, 0, 0
        for o in objs:
            s = size_of(o)
            if o in cache:
                hits += 1
                cache[o] = L + 1_000_000 // s
                continue
            while used + s > GDS_CAP and cache:
                victim = min(cache.items(), key=lambda kv: (kv[1], kv[0]))[0]
                L = cache[victim]
                used -= size_of(victim)
                del cache[victim]
                evs += 1
            cache[o] = L + 1_000_000 // s
            used += s
        got = q_greedydual_size(sf_tiny)
        assert got["gds_hits"].iloc[0] == hits
        assert got["gds_evictions"].iloc[0] == evs
        assert got["n_objects"].iloc[0] == len(set(objs))

    def test_size_awareness_effect(self, ray_session, sf_small):
        """GDS keeps small objects preferentially — on a skewed trace
        its hit count should at least match LRU's ballpark (within
        2×), and both must be < n_requests."""
        from searchengine_ray.pipelines.queries import q_greedydual_size

        got = q_greedydual_size(sf_small)
        assert got["gds_hits"].iloc[0] <= got["n_requests"].iloc[0]
        assert got["lru_hits"].iloc[0] <= got["n_requests"].iloc[0]
        if got["lru_hits"].iloc[0] > 0:
            assert got["gds_hits"].iloc[0] * 2 >= got["lru_hits"].iloc[0] // 2


class TestBowtieStructure:
    def test_matches_direct_reachability(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            _doc_graph_edges,
            q_bowtie_structure,
        )

        edges, n = _doc_graph_edges(sf_tiny)
        keep = edges[:, 0] != edges[:, 1]
        packed = np.unique(edges[keep, 0] * (1 << 31) + edges[keep, 1])
        src = (packed >> 31).astype(int)
        dst = (packed & ((1 << 31) - 1)).astype(int)
        fwd_adj = {}
        bwd_adj = {}
        for a, b in zip(src, dst):
            fwd_adj.setdefault(a, set()).add(b)
            bwd_adj.setdefault(b, set()).add(a)

        def reach(adj):
            seen = {0}
            stack = [0]
            while stack:
                x = stack.pop()
                for y in adj.get(x, ()):
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            return seen

        F, B = reach(fwd_adj), reach(bwd_adj)
        core = F & B
        got = q_bowtie_structure(sf_tiny).set_index("component")
        assert got.loc["core", "n_nodes"] == len(core)
        assert got.loc["in", "n_nodes"] == len(B - core)
        assert got.loc["out", "n_nodes"] == len(F - core)
        assert got.loc["other", "n_nodes"] == n - len(F | B)

    def test_partition_covers_graph(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bowtie_structure

        got = q_bowtie_structure(sf_tiny)
        assert got["n_nodes"].sum() == got["n_total"].iloc[0]
        # node 0 sits in the core by definition
        assert got.set_index("component").loc["core", "n_nodes"] >= 1
