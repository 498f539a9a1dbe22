"""Brute-force identity tests for the fielded-ranking wave
(BM25F + norm-quantization drift, registry 343-344)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest


def _raw_split(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return re.split(r"[ \t\n\x0b\f\r]+", t)  # keeps empties: positional


def _round_half_away(x: float, nd: int = 6) -> float:
    p = 10.0**nd
    return math.copysign(math.floor(abs(x) * p + 0.5) / p, x)




class TestBm25fFielded:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            BM25F_B_BODY,
            BM25F_B_TITLE,
            BM25F_TITLE_K,
            BM25F_W_BODY,
            BM25F_W_TITLE,
            EVAL_QUERIES,
            q_bm25f_fielded,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        qset = {t for q in EVAL_QUERIES for t in q}
        N = len(docs)
        tl, bl = {}, {}
        tf_t: dict[str, dict[int, int]] = {t: {} for t in qset}
        tf_b: dict[str, dict[int, int]] = {t: {} for t in qset}
        for did, text in zip(docs["doc_id"], docs["text"]):
            raw = _raw_split(text)
            ft = [t for t in raw[:BM25F_TITLE_K] if t and t not in STOP_WORDS]
            fb = [t for t in raw[BM25F_TITLE_K:] if t and t not in STOP_WORDS]
            tl[int(did)], bl[int(did)] = len(ft), len(fb)
            for t in ft:
                if t in qset:
                    tf_t[t][int(did)] = tf_t[t].get(int(did), 0) + 1
            for t in fb:
                if t in qset:
                    tf_b[t][int(did)] = tf_b[t].get(int(did), 0) + 1
        avg_t = sum(tl.values()) / N
        avg_b = sum(bl.values()) / N
        exp_rows = []
        for qid, terms in enumerate(EVAL_QUERIES):
            scores: dict[int, float] = {}
            for t in terms:
                docs_t = set(tf_t[t]) | set(tf_b[t])
                df = len(docs_t)
                if df == 0:
                    continue
                idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
                for d in docs_t:
                    bt = 1 - BM25F_B_TITLE + BM25F_B_TITLE * tl[d] / avg_t
                    bb = 1 - BM25F_B_BODY + BM25F_B_BODY * bl[d] / avg_b
                    tfw = (
                        BM25F_W_TITLE * tf_t[t].get(d, 0) / bt
                        + BM25F_W_BODY * tf_b[t].get(d, 0) / bb
                    )
                    scores[d] = scores.get(d, 0.0) + idf * tfw / (1.2 + tfw)
            ranked = sorted(
                ((_round_half_away(s), d) for d, s in scores.items()),
                key=lambda x: (-x[0], x[1]),
            )[:10]
            for rk, (s, d) in enumerate(ranked, 1):
                exp_rows.append((qid, rk, d, s))
        got = q_bm25f_fielded(sf_tiny)
        assert (
            list(got.itertuples(index=False, name=None))
            == [(q, r, d, pytest.approx(s, abs=5.1e-7)) for q, r, d, s in exp_rows]
        )

    def test_title_boost_visible(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bm25f_fielded

        got = q_bm25f_fielded(sf_tiny)
        assert got.groupby("qid")["rank"].max().ge(1).all()
        assert (got["score"] > 0).all()


