"""Brute-force identity tests for the tokenizer/feedback wave
(BPE fertility, Rocchio negative feedback; registry 433-434)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd


def _kept_tokens(text: str, stop) -> list[str]:
    return [
        t
        for t in re.sub(r"[,.;?!]", " ", (text or "").lower()).split()
        if t and t not in stop
    ]


class TestBpeApply:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import q_bpe_apply, q_bpe_train

        merges = [
            (f" {p.replace('+', ' ')} ", f" {m} ")
            for p, m in zip(*(q_bpe_train(sf_tiny)[c] for c in ("pair", "merged")))
        ]

        def n_sym(word: str) -> int:
            w = " " + " ".join(word) + " "
            for pat, rep in merges:
                w = w.replace(pat, rep)
            return len(w.split())

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["text", "source"]
        )
        agg: dict[str, list[int]] = {}
        for _, r in docs.iterrows():
            for t in _kept_tokens(r["text"], STOP_WORDS):
                if re.fullmatch("[a-z]+", t):
                    a = agg.setdefault(r["source"], [0, 0, 0])
                    a[0] += 1
                    a[1] += len(t)
                    a[2] += n_sym(t)
        got = q_bpe_apply(sf_tiny)
        for _, r in got.iterrows():
            w, c, s = agg[r["source"]]
            assert (r["n_words"], r["chars"], r["symbols"]) == (w, c, s)
            assert abs(r["fertility"] - s / w) < 1e-6
            assert abs(r["compression"] - c / s) < 1e-6

    def test_merges_reduce_symbols(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bpe_apply

        got = q_bpe_apply(sf_tiny)
        # symbols after merging never exceed chars (= symbols before)
        assert (got["symbols"] <= got["chars"]).all()
        assert (got["symbols"] < got["chars"]).any()  # merges actually fire
        assert (got["fertility"] >= 1.0).all()


class TestRocchio:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            ROCCHIO_ALPHA,
            ROCCHIO_BETA,
            ROCCHIO_GAMMA,
            ROCCHIO_R,
            ROCCHIO_SEED,
            ROCCHIO_T,
            q_rocchio,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        tfs = {
            int(r["doc_id"]): Counter(_kept_tokens(r["text"], STOP_WORDS))
            for _, r in docs.iterrows()
        }
        N = len(docs)
        df: Counter = Counter()
        for c in tfs.values():
            df.update(c.keys())
        idf = {t: math.log10(N / d + 1.0) for t, d in df.items()}

        # stage 1: engine tfidf formula (query-subvector norm)
        s1 = {}
        for did, c in tfs.items():
            dot = ln = 0.0
            for t in ROCCHIO_SEED:
                if t in c:
                    w = c[t] * idf[t]
                    dot += w * idf[t]
                    ln += w * w
            if ln > 0:
                s1[did] = round(dot / math.sqrt(ln), 6)
        ranked = sorted(s1.items(), key=lambda kv: (-kv[1], kv[0]))
        rel = {d for d, _ in ranked[:ROCCHIO_R]}
        ranked_asc = sorted(s1.items(), key=lambda kv: (kv[1], kv[0]))
        non = {d for d, _ in ranked_asc[:ROCCHIO_R]}

        u = {
            did: {
                t: c[t] * idf[t] / math.sqrt(sum((c[x] * idf[x]) ** 2 for x in c))
                for t in c
            }
            for did, c in tfs.items()
        }
        terms = set(ROCCHIO_SEED)
        for d in rel | non:
            terms |= set(u[d])
        qp = {}
        for t in sorted(terms):
            w = (
                ROCCHIO_ALPHA * (idf.get(t, 0.0) if t in ROCCHIO_SEED else 0.0)
                + ROCCHIO_BETA * sum(u[d].get(t, 0.0) for d in rel) / ROCCHIO_R
                - ROCCHIO_GAMMA * sum(u[d].get(t, 0.0) for d in non) / ROCCHIO_R
            )
            if w > 0:
                qp[t] = w
        qp = dict(
            sorted(qp.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:ROCCHIO_T]
        )
        s2 = {}
        for did, uv in u.items():
            dot = sum(qp[t] * uv[t] for t in qp if t in uv)
            if dot > 0:
                s2[did] = round(dot, 6)
        exp = sorted(s2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        got = q_rocchio(sf_tiny)
        assert list(zip(got["doc_id"], got["score"])) == exp
        assert list(got["rank"]) == list(range(1, len(exp) + 1))

    def test_negative_arm_changes_ranking(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_rocchio

        got = q_rocchio(sf_tiny)
        assert len(got) == 20
        assert got["score"].is_monotonic_decreasing or (
            got["score"].diff().dropna() <= 1e-9
        ).all()
