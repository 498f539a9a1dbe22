"""Brute-force identity tests for the IR-eval + ablation wave
(MAP/R-precision, stopword index-size gain; registry 425-426)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


class TestEvalMap:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            _engine,
            q_eval_map,
        )

        eng = _engine(sf_tiny)
        got = q_eval_map(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            res = eng.search_tfidf(terms, None)
            docs = np.asarray([d for d, _ in res], np.int64)
            scores = np.asarray([round(s, 6) for _, s in res], np.float64)
            ranked = docs[np.lexsort((docs, -scores))]
            full = set.intersection(
                *[set(int(x) for x in eng.search_keyword(t)) for t in terms]
            )
            R = len(full)
            rel = np.asarray([int(d) in full for d in ranked], bool)
            cum = np.cumsum(rel)
            pos = np.arange(1, len(ranked) + 1)
            ap = float((cum[rel] / pos[rel]).sum() / R) if R else 0.0
            row = got[got["qid"] == qid].iloc[0]
            assert row["n_rel"] == R
            assert abs(row["ap"] - ap) < 1e-6
            if R:
                assert abs(row["rprec"] - cum[R - 1] / R) < 1e-6

    def test_metric_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_eval_map

        got = q_eval_map(sf_tiny)
        assert ((got["ap"] >= 0) & (got["ap"] <= 1)).all()
        assert ((got["rprec"] >= 0) & (got["rprec"] <= 1)).all()


class TestStopwordGain:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import q_stopword_gain

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        rows = []
        for _, r in docs.iterrows():
            toks = [
                t
                for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if t
            ]
            kept = [t for t in toks if t not in STOP_WORDS]
            rows.append(
                (
                    r["source"],
                    len(toks),
                    len(kept),
                    len(set(toks)),
                    len(set(kept)),
                )
            )
        exp = (
            pd.DataFrame(
                rows,
                columns=[
                    "source",
                    "tokens_all",
                    "tokens_kept",
                    "postings_all",
                    "postings_kept",
                ],
            )
            .groupby("source", as_index=False)
            .sum()
            .sort_values("source")
            .reset_index(drop=True)
        )
        got = q_stopword_gain(sf_tiny)
        pd.testing.assert_frame_equal(
            got[exp.columns], exp.astype({c: "int64" for c in exp.columns[1:]})
        )
        # savings shares consistent with the counts
        tok_pct = 100.0 * (got["tokens_all"] - got["tokens_kept"]) / got["tokens_all"]
        assert np.allclose(got["token_save_pct"], tok_pct, atol=1e-6)

    def test_stopwords_actually_save(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_stopword_gain

        got = q_stopword_gain(sf_tiny)
        assert (got["tokens_kept"] <= got["tokens_all"]).all()
        assert (got["postings_kept"] <= got["postings_all"]).all()
        # english synthetic text: filtering saves something somewhere
        assert (got["token_save_pct"] > 0).any()
