"""Brute-force identity tests for the percolate / Theil-Sen-MK /
string_agg wave (registry 249-251)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestPercolate:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import PERCOLATE_QUERIES, q_percolate

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        sets = [set(ts) for ts in _token_lists(docs["text"])]
        ids = docs["doc_id"].to_numpy(np.int64)
        got = q_percolate(sf_tiny).set_index("qid")
        for q in PERCOLATE_QUERIES:
            hits = [
                all(t in s for t in q["must"])
                and (not q["should"] or any(t in s for t in q["should"]))
                and not any(t in s for t in q["must_not"])
                for s in sets
            ]
            hits = np.asarray(hits)
            assert int(got.loc[q["qid"], "n_docs"]) == int(hits.sum())
            assert int(got.loc[q["qid"], "docid_sum"]) == int(ids[hits].sum())

    def test_must_not_only_query(self, ray_session, sf_tiny):
        # a must_not-only stored query matches exactly the docs lacking
        # the term (the alert-on-absence shape)
        import searchengine_ray.pipelines.queries as Q
        from searchengine_ray.functions.textstats import _token_lists

        old = Q.PERCOLATE_QUERIES
        Q.PERCOLATE_QUERIES = [
            {"qid": 0, "must": [], "should": [], "must_not": ["join"]}
        ]
        try:
            got = Q.q_percolate(sf_tiny)
        finally:
            Q.PERCOLATE_QUERIES = old
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        miss = [("join" not in set(ts)) for ts in _token_lists(docs["text"])]
        assert int(got["n_docs"].iloc[0]) == int(np.sum(miss))


class TestTheilSenMK:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_theilsen_mk

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts"])
        day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy(np.int64)
        vc = pd.Series(day).value_counts().sort_index()
        d = vc.index.to_numpy(np.int64)
        c = vc.to_numpy(np.int64)
        n = len(d)
        slopes, sgn = [], 0
        for i in range(n):
            for j in range(i + 1, n):
                slopes.append((c[j] - c[i]) / (d[j] - d[i]))
                sgn += int(np.sign(c[j] - c[i]))
        _, tc = np.unique(c, return_counts=True)
        var = (n * (n - 1) * (2 * n + 5) - int((tc * (tc - 1) * (2 * tc + 5)).sum())) / 18.0
        z = (sgn - 1) / math.sqrt(var) if sgn > 0 else ((sgn + 1) / math.sqrt(var) if sgn < 0 else 0.0)
        got = q_theilsen_mk(sf_tiny)
        assert int(got["n_days"].iloc[0]) == n
        assert abs(got["sen_slope"].iloc[0] - float(np.median(slopes))) < 1e-6
        assert int(got["mk_s"].iloc[0]) == sgn
        assert abs(got["mk_z"].iloc[0] - z) < 1e-6


class TestTopTermsConcat:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import q_top_terms_concat

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "text"])
        per: dict[str, dict[str, int]] = {}
        for s, ts in zip(docs["source"], _token_lists(docs["text"])):
            d = per.setdefault(s, {})
            for t in ts:
                d[t] = d.get(t, 0) + 1
        got = q_top_terms_concat(sf_tiny).set_index("source")
        for s, d in per.items():
            top3 = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
            assert got.loc[s, "top_terms"] == ",".join(t for t, _ in top3)
            assert int(got.loc[s, "total_tf"]) == sum(c for _, c in top3)
