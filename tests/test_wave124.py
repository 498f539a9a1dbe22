"""Brute-force identity tests for the capacity-planning wave
(FFD shard packing, LSH band tuning; registry 445-446)."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd


class TestShardPlanFfd:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            SHARD_PLAN_TARGET_BINS,
            SHARD_PLAN_TERMS,
            q_shard_plan_ffd,
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
        items = sorted(
            ((8 + 4 * d, t) for t, d in df.items()), key=lambda x: (-x[0], x[1])
        )[:SHARD_PLAN_TERMS]
        sizes = [s for s, _ in items]
        total = sum(sizes)
        cap = -(-(total * 5) // (4 * SHARD_PLAN_TARGET_BINS))
        loads, assign = [], []
        for s in sizes:
            placed = next((i for i, ld in enumerate(loads) if ld + s <= cap), -1)
            if placed < 0:
                loads.append(s)
                assign.append(len(loads) - 1)
            else:
                loads[placed] += s
                assign.append(placed)
        exp = (
            pd.DataFrame({"bin_id": assign, "sz": sizes})
            .groupby("bin_id")
            .agg(n_terms=("sz", "size"), bin_bytes=("sz", "sum"))
            .reset_index()
        )
        got = q_shard_plan_ffd(sf_tiny)
        assert list(got["bin_id"]) == list(exp["bin_id"])
        assert list(got["n_terms"]) == list(exp["n_terms"])
        assert list(got["bin_bytes"]) == list(exp["bin_bytes"])
        assert (got["capacity"] == cap).all()
        assert (got["ffd_bins"] == len(loads)).all()
        assert (got["lower_bound_bins"] == -(-total // cap)).all()

    def test_packing_valid_and_tight(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_shard_plan_ffd

        got = q_shard_plan_ffd(sf_tiny)
        assert (got["bin_bytes"] <= got["capacity"]).all()
        # FFD guarantee: within 11/9·OPT + 1 of the lower bound
        lb = int(got["lower_bound_bins"].iloc[0])
        assert int(got["ffd_bins"].iloc[0]) <= (11 * lb) // 9 + 1


class TestLshTuning:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        import ray.data as rd

        from searchengine_ray.functions.dedup import ngram_jaccard_pairs
        from searchengine_ray.pipelines.queries import (
            LSH_TUNE_CONFIGS,
            LSH_TUNE_FLOOR,
            q_lsh_tuning,
        )

        ds = rd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        j = ngram_jaccard_pairs(ds, threshold=LSH_TUNE_FLOOR)["jaccard"].to_numpy()
        got = q_lsh_tuning(sf_tiny)
        for (b, r), (_, row) in zip(LSH_TUNE_CONFIGS, got.iterrows()):
            assert (row["bands"], row["rows_per_band"]) == (b, r)
            assert row["n_pairs"] == len(j)
            p = 1.0 - (1.0 - j**r) ** b
            assert abs(row["expected_cands"] - p.sum()) < 1e-5

    def test_s_curve_shape(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_lsh_tuning

        got = q_lsh_tuning(sf_tiny).sort_values("rows_per_band")
        # more rows per band = sharper curve = lower recall at fixed J
        assert got["p_at_05"].is_monotonic_decreasing
        assert ((got["p_at_05"] > 0) & (got["p_at_05"] < 1)).all()
        # expected candidates bounded by pair count
        assert (got["expected_cands"] <= got["n_pairs"] + 1e-9).all()
