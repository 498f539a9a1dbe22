"""Wave 187: Boyer-Moore-Horspool audit + IBLT reconciliation — vs
re.finditer ground truth and reconciliation guarantees."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


class TestBoyerMoore:
    def test_matches_equal_regex_truth(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BMH_PATTERN,
            BMH_PREFIX,
            q_boyer_moore,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        truth = sum(
            len(re.findall(f"(?={re.escape(BMH_PATTERN)})", t[:BMH_PREFIX]))
            for t in docs["text"]
        )
        got = q_boyer_moore(sf_tiny)
        assert got["matches"].iloc[0] == truth

    def test_sublinearity(self, ray_session, sf_tiny):
        """Horspool must compare fewer characters than naive on real
        text (the whole point), while trying fewer alignments than
        positions exist."""
        from searchengine_ray.pipelines.queries import BMH_PREFIX, q_boyer_moore

        got = q_boyer_moore(sf_tiny)
        assert got["chars_compared"].iloc[0] < got["naive_compared"].iloc[0]
        assert got["speedup_micro"].iloc[0] > 1_000_000
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        n_positions = sum(
            max(len(t[:BMH_PREFIX]) - 3, 0) for t in docs["text"]
        )
        assert got["alignments"].iloc[0] <= n_positions


class TestIbltReconcile:
    def test_recovers_exact_difference(self, ray_session, sf_tiny):
        """q_iblt_reconcile internally asserts recovery == truth; here
        recompute the truth independently and check the counts."""
        from searchengine_ray.pipelines.queries import _md5_low64, q_iblt_reconcile

        ids = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy(np.int64)
        inA = np.array([_md5_low64(f"{i}#a") % 20 != 0 for i in ids])
        inB = np.array([_md5_low64(f"{i}#b") % 20 != 0 for i in ids])
        got = q_iblt_reconcile(sf_tiny)
        assert got["n_a_only"].iloc[0] == int((inA & ~inB).sum())
        assert got["n_b_only"].iloc[0] == int((inB & ~inA).sum())
        assert got["n_common"].iloc[0] == int((inA & inB).sum())
        assert got["recovered"].sum() == (
            got["n_a_only"].iloc[0] + got["n_b_only"].iloc[0]
        )

    def test_space_is_diff_sized(self, ray_session, sf_tiny):
        """The IBLT's cell count scales with the DIFFERENCE, not the
        set size — the reconciliation win."""
        from searchengine_ray.pipelines.queries import q_iblt_reconcile

        got = q_iblt_reconcile(sf_tiny)
        n_total = got["n_common"].iloc[0] + got["n_a_only"].iloc[0] + got["n_b_only"].iloc[0]
        assert got["n_cells"].iloc[0] < n_total
        # peeling converges fast: first round recovers the majority
        assert got["recovered"].iloc[0] >= got["recovered"].sum() // 2
