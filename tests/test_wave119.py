"""Brute-force identity tests for the multi-index / graph-ANN wave
(federated search, navigable-graph greedy ANN; registry 435-436)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd




class TestGraphAnn:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            GRAPH_ANN_M,
            GRAPH_ANN_MAXSTEPS,
            GRAPH_ANN_QUERIES,
            GRAPH_ANN_STRIDE,
            q_graph_ann,
        )
        from searchengine_ray.pipelines.queries import round_half_away

        emb = pd.read_parquet(
            f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).sort_values("vec_id")
        ids = emb["vec_id"].to_numpy(np.int64)
        mat = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        subm = ids % GRAPH_ANN_STRIDE == 0
        sids, smat = ids[subm], mat[subm]
        sims = np.asarray(round_half_away(1e6 * (smat @ smat.T), 0), np.int64)
        np.fill_diagonal(sims, np.iinfo(np.int64).min)
        nbrs = {
            int(sids[i]): list(sids[np.lexsort((sids, -sims[i]))[:GRAPH_ANN_M]])
            for i in range(len(sids))
        }
        pos = {int(v): i for i, v in enumerate(sids)}
        entry = int(sids.min())
        got = q_graph_ann(sf_tiny)
        for qid in GRAPH_ANN_QUERIES:
            qv = mat[ids == qid][0]
            qs = np.asarray(round_half_away(1e6 * (smat @ qv), 0), np.int64)
            cur, steps = entry, 0
            for _ in range(GRAPH_ANN_MAXSTEPS):
                cand = nbrs[cur]
                best = min(cand, key=lambda d: (-qs[pos[d]], d))
                if qs[pos[best]] > qs[pos[cur]]:
                    cur, steps = best, steps + 1
                else:
                    break
            exact = int(sids[np.lexsort((sids, -qs))[0]])
            row = got[got["qid"] == qid].iloc[0]
            assert (row["steps"], row["final_id"], row["final_sim"]) == (
                steps,
                cur,
                int(qs[pos[cur]]),
            )
            assert row["exact_top"] == exact
            assert row["hit"] == int(cur == exact)

    def test_walk_improves(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_graph_ann

        got = q_graph_ann(sf_tiny)
        assert (got["steps"] >= 0).all()
        # the greedy endpoint is never better than the exact top-1
        assert (got["hit"].isin([0, 1])).all()
