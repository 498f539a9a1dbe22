"""Brute-force identity tests for the LLM-tokenizer/ranking wave
(late-interaction MaxSim, BPE merge training; registry 427-428)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd


def _md5_lower64(t: str) -> int:
    return int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")


def _tok(text: str, stop) -> list[str]:
    return [
        t
        for t in re.sub(r"[,.;?!]", " ", (text or "").lower()).split()
        if t and t not in stop
    ]




class TestBpeTrain:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            BPE_MERGES,
            BPE_TOP_WORDS,
            q_bpe_train,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        cnt: dict[str, int] = {}
        for t in docs["text"]:
            for w in _tok(t, STOP_WORDS):
                if re.fullmatch("[a-z]+", w):
                    cnt[w] = cnt.get(w, 0) + 1
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_WORDS]
        words = [" " + " ".join(w) + " " for w, _ in top]
        cnts = [c for _, c in top]
        exp = []
        for step in range(1, BPE_MERGES + 1):
            cand = set()
            for w in words:
                syms = w.split()
                cand.update(f" {a} {b} " for a, b in zip(syms, syms[1:]))
            best, bw = None, 0
            for pat in sorted(cand):
                pw = sum(c * w.count(pat) for w, c in zip(words, cnts))
                if pw > bw:
                    best, bw = pat, pw
            if best is None:
                break
            a, b = best.split()
            words = [w.replace(best, f" {a}{b} ") for w in words]
            exp.append((step, f"{a}+{b}", a + b, bw))
        got = q_bpe_train(sf_tiny)
        assert [tuple(r) for r in got.itertuples(index=False, name=None)] == exp

    def test_merges_compose(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bpe_train

        got = q_bpe_train(sf_tiny)
        assert len(got) > 0
        for _, r in got.iterrows():
            a, b = r["pair"].split("+")
            assert r["merged"] == a + b
            assert r["weight"] > 0
