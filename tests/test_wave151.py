"""Brute-force identity tests for the capstone wave
(full SERP response, crawl budget allocation; registry 499-500)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestSerpResponse:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SERP_K,
            SERP_QUERY,
            SITE_COLLAPSE_PER_SITE,
            _engine,
            q_serp_response,
        )

        eng = _engine(sf_tiny)
        res = eng.search_bm25(SERP_QUERY, topk=None)
        df = pd.DataFrame(
            {"doc_id": [d for d, _ in res], "score": [round(s, 6) for _, s in res]}
        )
        src = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"]
        )
        df = df.merge(src, on="doc_id")
        fac = (
            df.groupby("source")
            .size()
            .reset_index(name="n")
            .sort_values(["n", "source"], ascending=[False, True])
            .head(3)
        )
        facet = ",".join(f"{r['source']}:{r['n']}" for _, r in fac.iterrows())
        df = df.sort_values(["score", "doc_id"], ascending=[False, True])
        df["sr"] = df.groupby("source").cumcount() + 1
        exp = df[df["sr"] <= SITE_COLLAPSE_PER_SITE].head(SERP_K)
        got = q_serp_response(sf_tiny)
        assert list(got["doc_id"]) == list(exp["doc_id"])
        assert (got["total_hits"] == len(df)).all()
        assert (got["facets"] == facet).all()

    def test_serp_contract(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SITE_COLLAPSE_PER_SITE,
            q_serp_response,
        )

        got = q_serp_response(sf_tiny)
        assert got.groupby("source").size().max() <= SITE_COLLAPSE_PER_SITE
        assert got["facets"].nunique() == 1
        assert (got["total_hits"] >= len(got)).all()


class TestCrawlBudgetAlloc:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CRAWL_BUDGET_CHARS_FRAC,
            q_crawl_budget_alloc,
            q_quality_scores,
        )

        qual = q_quality_scores(sf_tiny)[["doc_id", "quality"]]
        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        )
        df = qual.merge(docs, on="doc_id")
        per = df.groupby("source").agg(
            mean_q=("quality", "mean"), chars=("n_chars", "sum"), docs=("doc_id", "size")
        )
        per["density"] = (per["mean_q"] * 1e6 / per["chars"]).round(6)
        order = per.reset_index().sort_values(
            ["density", "source"], ascending=[False, True]
        )
        budget = int(round(CRAWL_BUDGET_CHARS_FRAC * per["chars"].sum()))
        rem = budget
        exp = []
        for _, r in order.iterrows():
            take = min(int(r["chars"]), rem)
            exp.append((r["source"], take))
            rem -= take
            if rem <= 0:
                break
        got = q_crawl_budget_alloc(sf_tiny)
        assert list(zip(got["source"], got["alloc_chars"])) == exp
        assert (got["budget_chars"] == budget).all()

    def test_budget_exhausted_and_valid(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_crawl_budget_alloc

        got = q_crawl_budget_alloc(sf_tiny)
        assert got["alloc_chars"].sum() == got["budget_chars"].iloc[0]
        assert (got["alloc_chars"] <= got["chars"]).all()
        # greedy: priorities follow density order
        assert got["density"].is_monotonic_decreasing or (
            got["density"].diff().dropna() <= 1e-9
        ).all()
        # only the marginal (last) source is fractional
        assert (got["alloc_frac"].iloc[:-1] == 1.0).all()
