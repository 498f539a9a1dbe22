"""Brute-force identity tests for the multi-index / graph-ANN wave
(federated search, navigable-graph greedy ANN; registry 435-436)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd


class TestFederatedSearch:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            FED_K,
            FED_QUERY,
            q_federated_search,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        parts = []
        for lang, grp in docs.groupby("lang"):
            tfs = {}
            for _, r in grp.iterrows():
                toks = [
                    t
                    for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                    if t and t not in STOP_WORDS
                ]
                tfs[int(r["doc_id"])] = Counter(toks)
            N = len(grp)
            dls = {d: sum(c.values()) for d, c in tfs.items()}
            avgdl = sum(dls.values()) / N
            df: Counter = Counter()
            for c in tfs.values():
                df.update(c.keys())
            scored = {}
            for d, c in tfs.items():
                s = 0.0
                for t in FED_QUERY:
                    if t in c:
                        idf = math.log((N - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                        s += (
                            (1.2 + 1.0)
                            * idf
                            * (c[t] / (c[t] + 1.2 * (1 - 0.75 + 0.75 * dls[d] / avgdl)))
                        )
                if s > 0:
                    scored[d] = round(s, 6)
            if not scored:
                continue
            rank = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))
            mx = rank[0][1]
            for d, s in rank[:FED_K]:
                parts.append((lang, d, round(s / mx, 6)))
        exp = sorted(parts, key=lambda r: (-r[2], r[0], r[1]))[:FED_K]
        got = q_federated_search(sf_tiny)
        assert [
            (r["lang"], r["doc_id"], r["norm_score"]) for _, r in got.iterrows()
        ] == exp
        assert list(got["rank"]) == list(range(1, len(exp) + 1))

    def test_per_collection_normalization(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_federated_search

        got = q_federated_search(sf_tiny)
        assert ((got["norm_score"] > 0) & (got["norm_score"] <= 1.0)).all()
        # every collection's own top doc normalizes to exactly 1.0
        assert (got.groupby("lang")["norm_score"].max() == 1.0).any()


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
