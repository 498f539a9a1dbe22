"""Wave 165: LOF outliers + Condorcet fusion — vs direct
single-process recomputation and structural properties."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestLofOutliers:
    def _brute(self, sf_dir):
        from searchengine_ray.pipelines.queries import LOF_K, round_half_away

        t = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        t = t.sort_values("vec_id").reset_index(drop=True)
        ids = t["vec_id"].to_numpy(np.int64)
        M = np.stack([np.asarray(v, np.float64) for v in t["embedding"]])
        n = len(ids)
        knn = {}
        for j in range(n):
            d2 = ((M - M[j]) ** 2).sum(axis=1)
            micro = np.rint(round_half_away(d2, 6) * 1e6).astype(np.int64)
            cand = np.lexsort((ids, micro))
            cand = cand[ids[cand] != ids[j]][:LOF_K]
            knn[int(ids[j])] = [(int(ids[c]), int(micro[c])) for c in cand]
        kdist = {p: nb[-1][1] for p, nb in knn.items()}
        lrd = {
            p: LOF_K * 1e6 / sum(max(kdist[o], d) for o, d in nb)
            for p, nb in knn.items()
        }
        lof = {
            p: (sum(lrd[o] for o, _ in nb) / LOF_K) / lrd[p] for p, nb in knn.items()
        }
        return lof

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_lof_outliers

        want = self._brute(sf_tiny)
        got = q_lof_outliers(sf_tiny)
        for r in got.itertuples():
            assert abs(r.lof - round(want[int(r.vec_id)], 6)) < 1e-9, r.vec_id

    def test_uniform_cluster_scores_near_one(self, ray_session, sf_tiny):
        """LOF ≈ 1 for points in uniform density; the distribution
        should center near 1 with a small high tail."""
        from searchengine_ray.pipelines.queries import q_lof_outliers

        got = q_lof_outliers(sf_tiny)
        assert 0.8 < got["lof"].median() < 1.3
        assert (got["lof"] > 0).all()


class TestCondorcetFusion:
    def test_matches_direct_tally(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CONDORCET_DEPTH,
            EVAL_QUERIES,
            QL_MU,
            _engine,
            q_condorcet_fusion,
        )

        eng = _engine(sf_tiny)
        got = q_condorcet_fusion(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            def ranked(res):
                docs = np.asarray([d for d, _ in res], np.int64)
                scores = np.asarray([round(s, 6) for _, s in res], np.float64)
                return list(docs[np.lexsort((docs, -scores))])[:CONDORCET_DEPTH]

            systems = [
                ranked(eng.search_tfidf(terms, None)),
                ranked(eng.search_bm25(terms, topk=None)),
                ranked(eng.search_ql_dirichlet(" ".join(terms), mu=QL_MU, topk=None)),
            ]
            cand = sorted(set().union(*map(set, systems)))
            INF = CONDORCET_DEPTH + 1
            ranks = [{d: r for r, d in enumerate(s)} for s in systems]
            cop = {d: 0 for d in cand}
            for i, a in enumerate(cand):
                for b in cand[i + 1 :]:
                    va = sum(1 for ro in ranks if ro.get(a, INF) < ro.get(b, INF))
                    vb = sum(1 for ro in ranks if ro.get(b, INF) < ro.get(a, INF))
                    if va > vb:
                        cop[a] += 1
                        cop[b] -= 1
                    elif vb > va:
                        cop[b] += 1
                        cop[a] -= 1
            want_top = sorted(cand, key=lambda d: (-cop[d], d))[:10]
            sub = got[got["qid"] == qid].sort_values("rank")
            assert list(sub["doc_id"]) == [int(d) for d in want_top]
            assert list(sub["copeland"]) == [cop[d] for d in want_top]

    def test_unanimous_top_is_condorcet_winner(self, ray_session, sf_tiny):
        """If all three systems agree on the #1 doc, it must win the
        fused ranking (the Condorcet-winner guarantee)."""
        from searchengine_ray.pipelines.queries import q_condorcet_fusion

        got = q_condorcet_fusion(sf_tiny)
        for _, g in got.groupby("qid"):
            g = g.sort_values("rank")
            # winner has no losses iff it beat or tied everyone
            top = g.iloc[0]
            assert top["wins"] >= top["losses"]
            assert (g["rank"].to_numpy() == np.arange(1, len(g) + 1)).all()
