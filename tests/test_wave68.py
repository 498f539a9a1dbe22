"""Brute-force identity tests for the champion-list / codec-size wave
(registry 333-334)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest


def _punct_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestChampionLists:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            CHAMPION_M,
            EVAL_QUERIES,
            q_champion_lists,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        # stop-filtered tf per (doc, term), as sql_tokens_cte defines it
        tf: dict[tuple[int, str], int] = {}
        for did, text in zip(docs["doc_id"].astype(int), docs["text"]):
            for w in _punct_tokens(text):
                if w not in STOP_WORDS:
                    tf[(did, w)] = tf.get((did, w), 0) + 1
        df: dict[str, int] = {}
        for (_, w), _c in tf.items():
            df[w] = df.get(w, 0) + 1
        n_docs = len(docs)

        qterms = sorted({t for q in EVAL_QUERIES for t in q})
        champ = {}
        for t in qterms:
            posting = sorted(
                ((d, c) for (d, w), c in tf.items() if w == t),
                key=lambda x: (-x[1], x[0]),
            )
            champ[t] = {d for d, _ in posting[:CHAMPION_M]}

        got = q_champion_lists(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            idf = {t: math.log10(n_docs / df[t] + 1) for t in terms}
            dot: dict[int, float] = {}
            ln: dict[int, float] = {}
            for (d, w), c in tf.items():
                if w in idf:
                    wt = c * idf[w]
                    dot[d] = dot.get(d, 0.0) + wt * idf[w]
                    ln[d] = ln.get(d, 0.0) + wt * wt
            scores = {
                d: round(dot[d] / math.sqrt(ln[d]), 6) for d in dot if ln[d] > 0
            }
            ordered = sorted(scores, key=lambda d: (-scores[d], d))
            full_top = ordered[:10]
            cand = set().union(*(champ[t] for t in terms))
            champ_top = [d for d in ordered if d in cand][:10]
            hits = len(set(full_top) & set(champ_top))
            row = got[got["qid"] == qid].iloc[0]
            assert row["n_cands"] == len(cand)
            assert row["hits10"] == hits
            assert row["recall10"] == pytest.approx(
                hits / len(full_top), abs=5.1e-7
            )

    def test_recall_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_champion_lists

        got = q_champion_lists(sf_tiny)
        assert ((got["recall10"] >= 0) & (got["recall10"] <= 1)).all()
        assert (got["hits10"] <= 10).all()


def _vb_len(v: int) -> int:
    return 1 if v == 0 else (v.bit_length() + 6) // 7


