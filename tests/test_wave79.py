"""Brute-force identity tests for the QPP/alignment wave
(clarity score + LCS pairs, registry 355-356)."""

from __future__ import annotations

import math
import re
from difflib import SequenceMatcher

import numpy as np
import pandas as pd
import pytest


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


def _round_half_away(x: float, nd: int = 6) -> float:
    p = 10.0**nd
    return math.copysign(math.floor(abs(x) * p + 0.5) / p, x)


def _lcs(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    row = [0] * (lb + 1)
    for i in range(1, la + 1):
        diag = 0
        for j in range(1, lb + 1):
            tmp = row[j]
            row[j] = diag + 1 if a[i - 1] == b[j - 1] else max(row[j], row[j - 1])
            diag = tmp
    return row[lb]


class TestClarityScore:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            CLARITY_MU,
            CLARITY_R,
            EVAL_QUERIES,
            q_clarity_score,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        qset = {t for q in EVAL_QUERIES for t in q}
        N = len(docs)
        dls, cf = {}, {}
        tf_all: dict[int, dict[str, int]] = {}
        for did, text in zip(docs["doc_id"], docs["text"]):
            ts = [t for t in _raw_tokens(text) if t not in STOP_WORDS]
            dls[int(did)] = len(ts)
            m: dict[str, int] = {}
            for t in ts:
                m[t] = m.get(t, 0) + 1
                cf[t] = cf.get(t, 0) + 1
            tf_all[int(did)] = m
        C = float(sum(cf.values()))
        avgdl = C / N
        got = q_clarity_score(sf_tiny)
        assert (got["n_vocab"] == len(cf)).all()
        for qid, terms in enumerate(EVAL_QUERIES):
            scores: dict[int, float] = {}
            for t in terms:
                df = sum(1 for d in tf_all if t in tf_all[d])
                if df == 0:
                    continue
                idf = 2.2 * math.log((N - df + 0.5) / (df + 0.5) + 1.0)
                for d, m in tf_all.items():
                    f = m.get(t, 0)
                    if f:
                        scores[d] = scores.get(d, 0.0) + idf * f / (
                            f + 1.2 * (0.25 + 0.75 * dls[d] / avgdl)
                        )
            s6 = {
                d: int(_round_half_away(_round_half_away(v) * 1e6, 0))
                for d, v in scores.items()
            }
            top = sorted(s6, key=lambda d: (-s6[d], d))[:CLARITY_R]
            kl = 0.0
            for w in sorted(cf):
                pc = cf[w] / C
                pr = sum(
                    (tf_all[d].get(w, 0) + CLARITY_MU * pc)
                    / (dls[d] + CLARITY_MU)
                    for d in top
                ) / len(top)
                kl += pr * math.log2(pr / pc)
            row = got[got["qid"] == qid].iloc[0]
            assert row["clarity"] == pytest.approx(kl, abs=5.1e-7)

    def test_clarity_positive(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_clarity_score

        got = q_clarity_score(sf_tiny)
        # KL divergence is non-negative; a focused R-set gives > 0
        assert (got["clarity"] > 0).all()


class TestLcsPairs:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            LCS_PREFIX,
            LCS_STRIDE,
            q_lcs_pairs,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).set_index("doc_id")["text"]
        got = q_lcs_pairs(sf_tiny)
        exp = []
        for d in sorted(docs.index):
            if d % LCS_STRIDE == 0 and d + 1 in docs.index:
                a = docs[d][:LCS_PREFIX]
                b = docs[d + 1][:LCS_PREFIX]
                exp.append((d, d + 1, _lcs(a, b), len(a), len(b)))
        assert list(got.itertuples(index=False, name=None)) == exp

    def test_agrees_with_difflib_bound(self, ray_session, sf_tiny):
        """difflib's longest matching blocks lower-bound LCS; identity
        strings hit the full length."""
        assert _lcs("abcdef", "abcdef") == 6
        assert _lcs("abc", "xyz") == 0
        a, b = "the quick brown fox", "the quiet brown cow"
        m = SequenceMatcher(None, a, b)
        lb = sum(bl.size for bl in m.get_matching_blocks())
        assert _lcs(a, b) >= lb

    def test_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_lcs_pairs

        got = q_lcs_pairs(sf_tiny)
        assert (got["lcs"] <= np.minimum(got["len_a"], got["len_b"])).all()
        assert (got["lcs"] >= 0).all()
