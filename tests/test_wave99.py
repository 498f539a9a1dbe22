"""Brute-force identity tests for the serving-cache/substring wave
(prefix cache + distinct substrings, registry 395-396)."""

from __future__ import annotations

import math
import re

import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestPrefixCache:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PC_STRIDE,
            PC_TOKENS,
            q_prefix_cache,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        seqs = [
            (int(d), _raw_tokens(t)[:PC_TOKENS])
            for d, t in zip(docs["doc_id"], docs["text"])
            if d % PC_STRIDE == 0
        ]
        got = q_prefix_cache(sf_tiny)
        cc = ct = 0
        for i, (did, ts) in enumerate(seqs):
            best = 0
            for j in range(i):
                other = seqs[j][1]
                k = 0
                while k < min(len(ts), len(other)) and ts[k] == other[k]:
                    k += 1
                best = max(best, k)
            cc += best
            ct += len(ts)
            row = got[got["doc_id"] == did].iloc[0]
            assert row["n_tokens"] == len(ts)
            assert row["cached"] == best
            assert row["computed"] == len(ts) - best
            assert row["cum_hit_micro"] == int(
                math.floor(cc / ct * 1e6 + 0.5)
            )

    def test_cache_semantics(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_prefix_cache

        got = q_prefix_cache(sf_tiny).sort_values("doc_id")
        # the first request can never hit
        assert got.iloc[0]["cached"] == 0
        assert (got["cached"] + got["computed"] == got["n_tokens"]).all()
        # hits occur on this shared-vocabulary corpus
        assert got["cached"].sum() > 0


class TestDistinctSubstrings:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BWT_STRIDE,
            SA_PREFIX,
            q_distinct_substrings,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        got = q_distinct_substrings(sf_tiny)
        for d, t in zip(docs["doc_id"], docs["text"]):
            if d % BWT_STRIDE != 0:
                continue
            s = t[:SA_PREFIX]
            n = len(s)
            brute = len(
                {s[i:j] for i in range(n) for j in range(i + 1, n + 1)}
            )
            row = got[got["doc_id"] == d].iloc[0]
            assert row["n_distinct"] == brute
            assert row["n_chars"] == n
            assert (
                row["n_distinct"] == n * (n + 1) // 2 - row["lcp_sum"]
            )

    def test_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_distinct_substrings

        got = q_distinct_substrings(sf_tiny)
        n = got["n_chars"]
        assert (got["n_distinct"] <= n * (n + 1) // 2).all()
        assert (got["n_distinct"] >= n).all()  # at least every prefix length
