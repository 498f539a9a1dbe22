"""Brute-force identity tests for the Soundex/k-anonymity wave
(registry 315-316)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestSoundexBlocks:
    def test_soundex_known_values(self):
        # classic reference codes (simplified h/w variant matches the
        # standard on these)
        from searchengine_ray.pipelines.queries import _soundex

        assert _soundex("robert") == "R163"
        assert _soundex("rupert") == "R163"
        assert _soundex("tymczak") == "T522"  # h/w-as-silent variant
        assert _soundex("pfister") == "P236"  # adjacent same-code collapse
        assert _soundex("honeyman") == "H555"
        assert _soundex("small") == "S540"

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SOUNDEX_TOPK,
            _soundex,
            q_soundex_blocks,
        )

        parts = pd.read_parquet(f"{sf_tiny}/part.parquet", columns=["p_name"])
        occ: dict[str, int] = {}
        for name in parts["p_name"]:
            for w in name.split(" "):
                if w:
                    occ[w] = occ.get(w, 0) + 1
        buckets: dict[str, list] = {}
        for w, c in occ.items():
            buckets.setdefault(_soundex(w), []).append((w, c))
        rows = []
        for code, ws in buckets.items():
            n = len(ws)
            rows.append(
                (
                    code,
                    n,
                    sum(c for _, c in ws),
                    min(w for w, _ in ws),
                    n * (n - 1) // 2,
                )
            )
        rows.sort(key=lambda r: (-r[1], r[0]))
        want = pd.DataFrame(
            rows[:SOUNDEX_TOPK],
            columns=["code", "n_words", "n_occurrences", "min_word", "n_pairs"],
        ).astype({"n_words": "int64", "n_occurrences": "int64", "n_pairs": "int64"})
        got = q_soundex_blocks(sf_tiny)
        pd.testing.assert_frame_equal(got, want)


class TestKAnonymity:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import KANON_K, q_k_anonymity

        cust = pd.read_parquet(
            f"{sf_tiny}/customer.parquet", columns=["c_nationkey", "c_mktsegment"]
        )
        got = q_k_anonymity(sf_tiny).set_index("level")
        for level, keys in [
            ("nation_segment", ["c_nationkey", "c_mktsegment"]),
            ("nation_only", ["c_nationkey"]),
        ]:
            sizes = cust.groupby(keys).size()
            viol = sizes[sizes < KANON_K]
            row = got.loc[level]
            assert row["n_groups"] == len(sizes)
            assert row["n_violating"] == len(viol)
            assert row["rows_at_risk"] == int(viol.sum())
            assert row["min_group"] == int(sizes.min())

    def test_generalization_monotone(self, ray_session, sf_tiny):
        # coarsening the quasi-identifier can only shrink the risk
        from searchengine_ray.pipelines.queries import q_k_anonymity

        got = q_k_anonymity(sf_tiny).set_index("level")
        assert (
            got.loc["nation_only", "rows_at_risk"]
            <= got.loc["nation_segment", "rows_at_risk"]
        )
        assert (
            got.loc["nation_only", "min_group"]
            >= got.loc["nation_segment", "min_group"]
        )
