"""Brute-force identity tests for the ranking-variant / inequality
wave (BM25+, Theil decomposition; registry 501-502)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd


class TestBm25Plus:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            BM25PLUS_DELTA,
            BM25PLUS_K,
            SERP_QUERY,
            q_bm25_plus,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        tfs = {}
        for _, r in docs.iterrows():
            toks = [
                w
                for w in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if w and w not in STOP_WORDS
            ]
            tfs[int(r["doc_id"])] = Counter(toks)
        N = len(docs)
        dls = {d: sum(c.values()) for d, c in tfs.items()}
        avgdl = sum(dls.values()) / N
        df: Counter = Counter()
        for c in tfs.values():
            df.update(c.keys())
        scored = {}
        for d, c in tfs.items():
            b = p = 0.0
            for t in SERP_QUERY:
                if t in c:
                    idf = math.log((N - df[t] + 0.5) / (df[t] + 0.5) + 1)
                    norm = c[t] / (c[t] + 1.2 * (1 - 0.75 + 0.75 * dls[d] / avgdl))
                    b += 2.2 * idf * norm
                    p += 2.2 * idf * norm + BM25PLUS_DELTA * idf
            if b > 0:
                scored[d] = (round(b, 6), round(p, 6))
        base = sorted(scored.items(), key=lambda kv: (-kv[1][0], kv[0]))
        base_rank = {d: i + 1 for i, (d, _) in enumerate(base)}
        plus = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))[:BM25PLUS_K]
        got = q_bm25_plus(sf_tiny)
        for (d, (b, p)), (_, r) in zip(plus, got.iterrows()):
            assert r["doc_id"] == d
            assert abs(r["bm25"] - b) < 1e-9
            assert abs(r["bm25_plus"] - p) < 1e-9
            assert r["base_rank"] == base_rank[d]

    def test_plus_dominates(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bm25_plus

        got = q_bm25_plus(sf_tiny)
        # the +delta floor only ever raises a matched doc's score
        assert (got["bm25_plus"] > got["bm25"]).all()


class TestTheilDecomp:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_theil_decomp

        orders = pd.read_parquet(
            f"{sf_tiny}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        rev = orders.groupby("o_custkey")["o_totalprice"].sum().reset_index()
        cust = pd.read_parquet(
            f"{sf_tiny}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        df = rev.merge(cust, left_on="o_custkey", right_on="c_custkey")
        x = df["o_totalprice"].to_numpy(float)
        mu = x.mean()
        T = np.mean(x / mu * np.log(x / mu))
        got = q_theil_decomp(sf_tiny)
        assert abs(got["theil_total"].iloc[0] - T) < 1e-6
        for nk, g in df.groupby("c_nationkey"):
            xs = g["o_totalprice"].to_numpy(float)
            tg = np.mean(xs / xs.mean() * np.log(xs / xs.mean()))
            row = got[got["nationkey"] == nk].iloc[0]
            assert row["customers"] == len(xs)
            assert abs(row["theil_within_g"] - tg) < 1e-6

    def test_decomposition_identity(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_theil_decomp

        got = q_theil_decomp(sf_tiny)
        # Theil is additively decomposable: T = T_between + T_within
        assert (
            abs(
                got["theil_total"].iloc[0]
                - got["theil_between"].iloc[0]
                - got["theil_within"].iloc[0]
            )
            < 2e-6
        )
        assert (got["theil_within_g"] >= -1e-9).all()
