"""Brute-force identity tests for the graph-keyword / linguistics wave
(TextRank terms, Chao1 vocabulary estimate; registry 489-490)."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd


class TestTextrankTerms:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            TEXTRANK_D,
            TEXTRANK_ITERS,
            TEXTRANK_TOPK,
            TEXTRANK_WINDOW,
            q_textrank_terms,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        cnt: Counter = Counter()
        for t in docs["text"]:
            kept = [
                w
                for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split()
                if w and w not in STOP_WORDS
            ]
            for i, a in enumerate(kept):
                for j in range(i + 1, min(i + TEXTRANK_WINDOW + 1, len(kept))):
                    b = kept[j]
                    if a != b:
                        cnt[tuple(sorted((a, b)))] += 1
        vocab = sorted({w for k in cnt for w in k})
        vi = {t: i for i, t in enumerate(vocab)}
        V = len(vocab)
        W = np.zeros((V, V))
        for (a, b), w in cnt.items():
            W[vi[a], vi[b]] += w
            W[vi[b], vi[a]] += w
        out_w = W.sum(axis=1)
        x = np.ones(V)
        for _ in range(TEXTRANK_ITERS):
            x = (1 - TEXTRANK_D) + TEXTRANK_D * (W.T @ (x / out_w))
        sc = np.round(x, 6)
        order = np.lexsort((np.asarray(vocab, object), -sc))[:TEXTRANK_TOPK]
        got = q_textrank_terms(sf_tiny)
        assert list(got["term"]) == [vocab[i] for i in order]
        assert np.allclose(got["score"], sc[order], atol=2e-6)

    def test_scores_positive(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import TEXTRANK_D, q_textrank_terms

        got = q_textrank_terms(sf_tiny)
        # damped PageRank floor: every score >= 1 - d
        assert (got["score"] >= 1 - TEXTRANK_D - 1e-9).all()


class TestChao1Vocab:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import q_chao1_vocab

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["text", "source"]
        )
        per: dict[str, Counter] = {}
        for _, r in docs.iterrows():
            per.setdefault(r["source"], Counter()).update(
                w
                for w in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if w and w not in STOP_WORDS
            )
        got = q_chao1_vocab(sf_tiny).set_index("source")
        for s, c in per.items():
            S, N = len(c), sum(c.values())
            f1 = sum(1 for v in c.values() if v == 1)
            f2 = sum(1 for v in c.values() if v == 2)
            chao = S + (f1 * f1 / (2 * f2) if f2 else f1 * (f1 - 1) / 2)
            row = got.loc[s]
            assert (row["types"], row["tokens"], row["f1"], row["f2"]) == (
                S,
                N,
                f1,
                f2,
            )
            assert abs(row["chao1"] - chao) < 1e-6
            assert abs(row["coverage"] - (1 - f1 / N)) < 1e-6

    def test_estimator_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_chao1_vocab

        got = q_chao1_vocab(sf_tiny)
        # Chao1 never estimates fewer types than observed
        assert (got["chao1"] >= got["types"]).all()
        assert ((got["coverage"] > 0) & (got["coverage"] <= 1)).all()
