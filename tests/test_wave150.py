"""Brute-force identity tests for the planner-stress / sizing wave
(worst-case intersections, memory budget; registry 497-498)."""

from __future__ import annotations

import itertools
import re
from collections import Counter

import numpy as np
import pandas as pd


def _docsets(sf_dir):
    from searchengine_ray.analysis.stopwords import STOP_WORDS

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    sets = []
    cf: Counter = Counter()
    for t in docs["text"]:
        toks = [
            w
            for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split()
            if w and w not in STOP_WORDS
        ]
        cf.update(toks)
        sets.append(set(toks))
    return sets, cf


class TestWorstCasePairs:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            WCP_HEAD_TERMS,
            WCP_TOPK,
            q_worst_case_pairs,
        )

        sets, _ = _docsets(sf_tiny)
        df: Counter = Counter()
        for s in sets:
            df.update(s)
        head = dict(
            sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:WCP_HEAD_TERMS]
        )
        rows = []
        for a, b in itertools.combinations(sorted(head), 2):
            inter = sum(1 for s in sets if a in s and b in s)
            rows.append((min(head[a], head[b]), a, b, inter))
        rows.sort(key=lambda r: (-r[0], r[1], r[2]))
        got = q_worst_case_pairs(sf_tiny)
        for (mdf, a, b, inter), (_, r) in zip(rows[:WCP_TOPK], got.iterrows()):
            assert (r["term_a"], r["term_b"]) == (a, b)
            assert r["min_df"] == mdf
            assert r["intersection"] == inter
            assert abs(r["selectivity"] - inter / mdf) < 1e-6

    def test_bound_holds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_worst_case_pairs

        got = q_worst_case_pairs(sf_tiny)
        assert (got["intersection"] <= got["min_df"]).all()
        assert (got["min_df"] == got[["df_a", "df_b"]].min(axis=1)).all()


class TestMemoryBudget:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            MEMBUDGET_COVERAGE,
            q_memory_budget,
        )

        sets, cf = _docsets(sf_tiny)
        df: Counter = Counter()
        for s in sets:
            df.update(s)
        order = sorted(df, key=lambda t: (-df[t], t))
        cum_cf = np.cumsum([cf[t] for t in order])
        cum_by = np.cumsum([8 + 4 * df[t] for t in order])
        total = int(cum_cf[-1])
        got = q_memory_budget(sf_tiny)
        for pct, (_, r) in zip(MEMBUDGET_COVERAGE, got.iterrows()):
            need = -(-total * pct // 100)
            k = int(np.searchsorted(cum_cf, need)) + 1
            assert (r["coverage_pct"], r["terms_needed"]) == (pct, k)
            assert r["bytes_needed"] == int(cum_by[k - 1])
            assert abs(r["actual_coverage"] - cum_cf[k - 1] / total) < 1e-6

    def test_budget_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_memory_budget

        got = q_memory_budget(sf_tiny)
        assert got["terms_needed"].is_monotonic_increasing
        assert got["bytes_needed"].is_monotonic_increasing
        # actual coverage meets the target
        assert (got["actual_coverage"] * 100 >= got["coverage_pct"] - 1e-6).all()
