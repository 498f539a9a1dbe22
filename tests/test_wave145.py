"""Brute-force identity tests for the keyphrase / curation wave
(RAKE keywords, pipeline order; registry 487-488)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd


class TestRakeKeywords:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            RAKE_MAXLEN,
            RAKE_TOPK,
            q_rake_keywords,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        phr: Counter = Counter()
        wfreq: Counter = Counter()
        wdeg: Counter = Counter()
        for t in docs["text"]:
            ts = [
                w for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split() if w
            ]
            run = []
            for w in ts + ["."]:
                if w in STOP_WORDS or w == ".":
                    if 0 < len(run) <= RAKE_MAXLEN:
                        phr[" ".join(run)] += 1
                        for x in run:
                            wfreq[x] += 1
                            wdeg[x] += len(run)
                    run = []
                else:
                    run.append(w)
        scored = [
            (p, c, round(sum(wdeg[w] / wfreq[w] for w in p.split()), 6))
            for p, c in phr.items()
        ]
        exp = sorted(scored, key=lambda x: (-x[2], x[0]))[:RAKE_TOPK]
        got = q_rake_keywords(sf_tiny)
        assert [
            (r["phrase"], r["count"], r["score"]) for _, r in got.iterrows()
        ] == exp
        assert list(got["rank"]) == list(range(1, len(exp) + 1))

    def test_phrases_are_stopword_free(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import RAKE_MAXLEN, q_rake_keywords

        got = q_rake_keywords(sf_tiny)
        for p in got["phrase"]:
            ws = p.split()
            assert 1 <= len(ws) <= RAKE_MAXLEN
            assert not any(w in STOP_WORDS for w in ws)


class TestPipelineOrder:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import q_pipeline_order

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        k = docs["text"].map(
            lambda t: len(
                [
                    w
                    for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split()
                    if w and w not in STOP_WORDS
                ]
            )
        )
        fp = docs["text"].map(lambda t: hashlib.md5((t or "").encode()).hexdigest())
        df = pd.DataFrame({"doc_id": docs["doc_id"], "k": k, "fp": fp})

        def med(s):
            v = np.sort(s.to_numpy(np.int64))
            return int(v[-(-len(v) // 2) - 1])

        thrA = med(df["k"])
        fA = df[df["k"] >= thrA]
        finalA = fA["fp"].nunique()
        dB = df.groupby("fp", as_index=False)["k"].min()
        thrB = med(dB["k"])
        finalB = int((dB["k"] >= thrB).sum())
        got = q_pipeline_order(sf_tiny).set_index("order")
        a = got.loc["filter_then_dedup"]
        b = got.loc["dedup_then_filter"]
        assert (a["threshold"], a["after_first"], a["final_docs"]) == (
            thrA,
            len(fA),
            finalA,
        )
        assert (b["threshold"], b["after_first"], b["final_docs"]) == (
            thrB,
            len(dB),
            finalB,
        )
        assert (got["divergence"] == abs(finalA - finalB)).all()

    def test_orders_internally_consistent(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_pipeline_order

        got = q_pipeline_order(sf_tiny)
        assert (got["final_docs"] <= got["after_first"]).all()
        assert (got["after_first"] <= got["n_input"]).all()
