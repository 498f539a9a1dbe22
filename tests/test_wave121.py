"""Brute-force identity tests for the SERP-diversity / contamination
wave (site collapse, split leakage; registry 439-440)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd


def _kept(text: str, stop) -> list[str]:
    return [
        t
        for t in re.sub(r"[,.;?!]", " ", (text or "").lower()).split()
        if t and t not in stop
    ]




class TestSplitLeakage:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            LEAK_SHINGLE_K,
            q_split_leakage,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        train_sh: set = set()
        val_docs = {}
        for _, r in docs.iterrows():
            did = int(r["doc_id"])
            bucket = (
                int.from_bytes(hashlib.md5(str(did).encode()).digest()[8:], "little")
                % 10
            )
            kept = _kept(r["text"], STOP_WORDS)
            sh = {
                " ".join(kept[i : i + LEAK_SHINGLE_K])
                for i in range(len(kept) - LEAK_SHINGLE_K + 1)
            }
            if bucket < 8:
                train_sh |= sh
            elif bucket == 8 and sh:
                val_docs[did] = sh
        got = q_split_leakage(sf_tiny)
        assert set(got["doc_id"]) == set(val_docs)
        for _, r in got.iterrows():
            sh = val_docs[int(r["doc_id"])]
            leaked = len(sh & train_sh)
            assert r["n_shingles"] == len(sh)
            assert r["n_leaked"] == leaked
            assert abs(r["leak_share"] - leaked / len(sh)) < 1e-6

    def test_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_split_leakage

        got = q_split_leakage(sf_tiny)
        assert (got["n_leaked"] <= got["n_shingles"]).all()
        assert ((got["leak_share"] >= 0) & (got["leak_share"] <= 1)).all()
