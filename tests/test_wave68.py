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


class TestCodecSizeAudit:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_codec_size_audit

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        postings: dict[str, set[int]] = {}
        for did, text in zip(docs["doc_id"].astype(int), docs["text"]):
            for w in set(_punct_tokens(text)):
                postings.setdefault(w, set()).add(did)
        buckets: dict[int, list[int]] = {}
        for t, ids in postings.items():
            srt = sorted(ids)
            vals = [srt[0]] + [b - a for a, b in zip(srt, srt[1:])]
            vb = sum(_vb_len(v) for v in vals)
            buckets.setdefault(len(str(len(srt))), []).append((len(srt), vb))
        exp = pd.DataFrame(
            [
                {
                    "df_digits": k,
                    "n_terms": len(v),
                    "raw_bytes": 4 * sum(d for d, _ in v),
                    "vb_bytes": sum(b for _, b in v),
                }
                for k, v in sorted(buckets.items())
            ]
        )
        got = q_codec_size_audit(sf_tiny)
        assert got["df_digits"].tolist() == exp["df_digits"].tolist()
        assert got["n_terms"].tolist() == exp["n_terms"].tolist()
        assert got["raw_bytes"].tolist() == exp["raw_bytes"].tolist()
        assert got["vb_bytes"].tolist() == exp["vb_bytes"].tolist()
        for g, r, v in zip(got["ratio"], exp["raw_bytes"], exp["vb_bytes"]):
            assert g == pytest.approx(r / v, abs=5.1e-7)

    def test_real_codec_matches_ladder(self):
        """The analytic ladder the SQL oracle uses must equal the real
        encoder's output length, including 128-power boundaries."""
        from searchengine_ray.codec.varbyte import encode

        for ids in (
            [0],
            [0, 1],
            [127],
            [128],
            [16383, 16384 + 16383],
            [5, 2097152 + 5],
            [2**40, 2**41],
        ):
            arr = np.asarray(ids, np.int64)
            vals = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])]
            assert len(encode(arr)) == sum(_vb_len(v) for v in vals)
