"""Brute-force identity tests for the training-loop wave
(hard-negative mining, uncertainty sampling; registry 441-442)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestHardNegatives:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            HARDNEG_K,
            _engine,
            q_hard_negatives,
        )

        eng = _engine(sf_tiny)
        got = q_hard_negatives(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            res = eng.search_bm25(terms, topk=None)
            docs = np.asarray([d for d, _ in res], np.int64)
            scores = np.asarray([round(s, 6) for _, s in res], np.float64)
            order = np.lexsort((docs, -scores))
            tsets = [set(int(x) for x in eng.search_keyword(t)) for t in terms]
            exp = []
            for i in order:
                d = int(docs[i])
                nm = sum(d in s for s in tsets)
                if nm == len(terms):
                    continue
                exp.append((d, float(scores[i]), nm))
                if len(exp) >= HARDNEG_K:
                    break
            g = got[got["qid"] == qid]
            assert [
                (r["doc_id"], r["score"], r["n_match"]) for _, r in g.iterrows()
            ] == exp

    def test_negatives_are_near_misses(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import EVAL_QUERIES, q_hard_negatives

        got = q_hard_negatives(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            g = got[got["qid"] == qid]
            # every mined negative matches SOME but not ALL query terms
            assert (g["n_match"] >= 1).all()
            assert (g["n_match"] < len(terms)).all()


class TestUncertaintySample:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        import re

        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            UNCERTAIN_K,
            q_logreg_quality,
            q_uncertainty_sample,
        )

        fit = q_logreg_quality(sf_tiny).iloc[-1]
        b0, b1, b2 = float(fit["b0"]), float(fit["b1"]), float(fit["b2"])
        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        )
        rows = []
        for _, r in docs.iterrows():
            toks = [
                t
                for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if t
            ]
            if not toks:
                continue
            x1 = sum(t in STOP_WORDS for t in toks) / len(toks)
            x2 = np.log1p(r["n_chars"])
            p = 1.0 / (1.0 + np.exp(-(b0 + b1 * x1 + b2 * x2)))
            rows.append((int(r["doc_id"]), round(p, 6), round(abs(p - 0.5), 6)))
        exp = sorted(rows, key=lambda t: (t[2], t[0]))[:UNCERTAIN_K]
        got = q_uncertainty_sample(sf_tiny)
        assert [
            (r["doc_id"], r["p"], r["margin"]) for _, r in got.iterrows()
        ] == exp
        assert list(got["rank"]) == list(range(1, len(exp) + 1))

    def test_margin_ordering(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_uncertainty_sample

        got = q_uncertainty_sample(sf_tiny)
        assert got["margin"].is_monotonic_increasing
        assert ((got["p"] >= 0) & (got["p"] <= 1)).all()
