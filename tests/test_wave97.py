"""Brute-force identity tests for the compression-model/optimizer wave
(LZ77 matches + predicate reorder, registry 391-392)."""

from __future__ import annotations

from itertools import permutations

import numpy as np
import pandas as pd


def _lz_stats(s: str, min_match: int):
    n = len(s)
    lits = sm = mx = 0
    for i in range(n):
        best = 0
        for j in range(i):
            k = 0
            while i + k < n and s[j + k] == s[i + k]:
                k += 1
            best = max(best, k)
        if best < min_match:
            lits += 1
        else:
            sm += best
            mx = max(mx, best)
    return n, lits, mx, sm


class TestLzMatches:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            LZ_MIN_MATCH,
            LZ_PREFIX,
            LZ_STRIDE,
            q_lz_matches,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        exp = [
            (int(d),) + _lz_stats(t[:LZ_PREFIX], LZ_MIN_MATCH)
            for d, t in zip(docs["doc_id"], docs["text"])
            if d % LZ_STRIDE == 0
        ]
        got = q_lz_matches(sf_tiny)
        assert list(got.itertuples(index=False, name=None)) == exp

    def test_lz_properties(self):
        # repetitive strings match long, random-ish strings stay literal
        n, lits, mx, sm = _lz_stats("abababababab", 3)
        assert mx >= 8  # self-referential run
        n2, lits2, mx2, sm2 = _lz_stats("abcdefgh", 3)
        assert lits2 == 8 and mx2 == 0


class TestPredicateReorder:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PRED_DEFS,
            q_predicate_reorder,
        )

        li = pd.read_parquet(
            f"{sf_tiny}/lineitem.parquet",
            columns=["l_quantity", "l_discount", "l_tax", "l_returnflag"],
        )
        N = len(li)
        cnt = [
            int((li["l_quantity"] <= 25).sum()),
            int((li["l_discount"] >= 0.05).sum()),
            int((li["l_tax"] <= 0.04).sum()),
            int((li["l_returnflag"] == "A").sum()),
        ]
        names = [p[0] for p in PRED_DEFS]
        exp = sorted(
            (
                (
                    "-".join(names[i] for i in perm),
                    N**3
                    + cnt[perm[0]] * N**2
                    + cnt[perm[0]] * cnt[perm[1]] * N
                    + cnt[perm[0]] * cnt[perm[1]] * cnt[perm[2]],
                )
                for perm in permutations(range(4))
            ),
            key=lambda x: (x[1], x[0]),
        )
        got = q_predicate_reorder(sf_tiny)
        assert [
            (o, c) for o, c in zip(got["ordering"], got["cost_scaled"])
        ] == exp

    def test_selectivity_first_wins(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_predicate_reorder

        got = q_predicate_reorder(sf_tiny)
        best = got.iloc[0]
        worst = got.iloc[-1]
        assert best["cost_scaled"] < worst["cost_scaled"]
        # reversing the best ordering should cost more
        rev = "-".join(reversed(best["ordering"].split("-")))
        assert (
            got.loc[got["ordering"] == rev, "cost_scaled"].iloc[0]
            >= best["cost_scaled"]
        )
