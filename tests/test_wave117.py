"""Brute-force identity tests for the dedup/tolerant-retrieval wave
(cross-doc substring dedup, permuterm wildcards; registry 431-432)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd


class TestSubstringDedup:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SUBDUP_K,
            SUBDUP_MAXLEN,
            q_substring_dedup,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        gram_docs: dict[str, set] = defaultdict(set)
        per_doc: dict[int, Counter] = {}
        anchors = {}
        for _, r in docs.iterrows():
            t = (r["text"] or "")[:SUBDUP_MAXLEN]
            n = len(t) - SUBDUP_K + 1
            if n <= 0:
                continue
            did = int(r["doc_id"])
            anchors[did] = n
            c = Counter(t[i : i + SUBDUP_K] for i in range(n))
            per_doc[did] = c
            for g in c:
                gram_docs[g].add(did)
        dup_grams = {g for g, ds in gram_docs.items() if len(ds) >= 2}
        got = q_substring_dedup(sf_tiny)
        assert set(got["doc_id"]) == set(anchors)
        for _, r in got.iterrows():
            did = int(r["doc_id"])
            exp_dup = sum(c for g, c in per_doc[did].items() if g in dup_grams)
            assert r["n_anchors"] == anchors[did]
            assert r["n_dup"] == exp_dup
            assert abs(r["dup_share"] - exp_dup / anchors[did]) < 1e-6

    def test_share_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_substring_dedup

        got = q_substring_dedup(sf_tiny)
        assert ((got["dup_share"] >= 0) & (got["dup_share"] <= 1)).all()
        assert (got["n_dup"] <= got["n_anchors"]).all()


class TestPermuterm:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            PERMUTERM_QUERIES,
            q_permuterm,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        df: Counter = Counter()
        for t in docs["text"]:
            toks = {
                w
                for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split()
                if w and w not in STOP_WORDS
            }
            df.update(toks)
        exp = []
        for pat in PERMUTERM_QUERIES:
            x, y = pat.split("*")
            for term in sorted(df):
                if (
                    term.startswith(x)
                    and term.endswith(y)
                    and len(term) >= len(x) + len(y)
                ):
                    exp.append((pat, term, df[term]))
        exp = sorted(exp)
        got = q_permuterm(sf_tiny)
        assert sorted(map(tuple, got.itertuples(index=False, name=None))) == exp

    def test_rotation_equivalence(self, ray_session):
        """The rotated-prefix rule IS the wildcard rule, term by term."""
        terms = ["mee", "merge", "stream", "s", "query", "windows"]
        for pat in ["m*e", "s*", "*m", "qu*y", "*"]:
            x, y = pat.split("*")
            for t in terms:
                aug = t + "$"
                rots = {aug[i:] + aug[:i] for i in range(len(aug))}
                via_rot = len(t) >= len(x) + len(y) and any(
                    r.startswith(f"{y}${x}") for r in rots
                )
                direct = (
                    t.startswith(x) and t.endswith(y) and len(t) >= len(x) + len(y)
                )
                assert via_rot == direct, (pat, t)
