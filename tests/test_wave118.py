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


