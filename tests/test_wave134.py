"""Brute-force identity tests for the caching/fairness wave
(result-cache invalidation, exposure fairness; registry 465-466)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


class TestCacheInvalidation:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            CACHE_INC_MOD,
            CACHE_QUERIES,
            q_cache_invalidation,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        touched = set()
        for _, r in docs.iterrows():
            if int(r["doc_id"]) % CACHE_INC_MOD != 0:
                continue
            touched |= {
                t
                for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if t and t not in STOP_WORDS
            }
        got = q_cache_invalidation(sf_tiny).set_index("query")
        for q in CACHE_QUERIES:
            hit = sum(t in touched for t in q)
            row = got.loc[" ".join(q)]
            assert row["n_terms"] == len(q)
            assert row["touched_terms"] == hit
            assert row["invalidated"] == int(hit > 0)

    def test_conservative_rule(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cache_invalidation

        got = q_cache_invalidation(sf_tiny)
        assert (got["touched_terms"] <= got["n_terms"]).all()
        assert ((got["invalidated"] == 1) == (got["touched_terms"] > 0)).all()


class TestExposureFairness:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            FAIR_TOPK,
            SITE_COLLAPSE_QUERY,
            _engine,
            q_exposure_fairness,
        )

        eng = _engine(sf_tiny)
        res = eng.search_bm25(SITE_COLLAPSE_QUERY, topk=None)
        df = (
            pd.DataFrame(
                {
                    "doc_id": [d for d, _ in res],
                    "score": [round(s, 6) for _, s in res],
                }
            )
            .sort_values(["score", "doc_id"], ascending=[False, True])
            .head(FAIR_TOPK)
            .reset_index(drop=True)
        )
        df["rank"] = np.arange(1, len(df) + 1)
        df["e"] = 1.0 / np.log2(1.0 + df["rank"])
        src = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"]
        )
        df = df.merge(src, on="doc_id")
        n_total = len(src)
        tot = df["e"].sum()
        got = q_exposure_fairness(sf_tiny).set_index("source")
        for s, g in df.groupby("source"):
            row = got.loc[s]
            cshare = (src["source"] == s).sum() / n_total
            assert row["n_in_topk"] == len(g)
            assert abs(row["exposure_share"] - g["e"].sum() / tot) < 1e-6
            assert abs(row["corpus_share"] - cshare) < 1e-6
            assert abs(row["disparity"] - (g["e"].sum() / tot) / cshare) < 1e-5

    def test_shares_sum_to_one(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_exposure_fairness

        got = q_exposure_fairness(sf_tiny)
        assert abs(got["exposure_share"].sum() - 1.0) < 1e-4
        assert (got["disparity"] > 0).all()
