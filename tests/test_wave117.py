"""Brute-force identity tests for the dedup/tolerant-retrieval wave
(cross-doc substring dedup, permuterm wildcards; registry 431-432)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd




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
