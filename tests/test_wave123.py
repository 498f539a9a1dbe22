"""Brute-force identity tests for the pretraining-data wave
(MLM masking plan, preference pairs; registry 443-444)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")


class TestMlmMasks:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            MLM_RATE_PCT,
            MLM_REPLACE_LT,
            q_mlm_masks,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        agg: dict[str, list[int]] = {}
        for _, r in docs.iterrows():
            kept = [
                t
                for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if t and t not in STOP_WORDS
            ]
            a = agg.setdefault(r["source"], [0, 0, 0, 0, 0])
            a[0] += len(kept)
            for p in range(1, len(kept) + 1):
                if _h64(f"{int(r['doc_id'])}:{p}") % 100 < MLM_RATE_PCT:
                    a[1] += 1
                    f = _h64(f"{int(r['doc_id'])}:{p}:r") % 10
                    if f < MLM_REPLACE_LT:
                        a[2] += 1
                    elif f == MLM_REPLACE_LT:
                        a[3] += 1
                    else:
                        a[4] += 1
        got = q_mlm_masks(sf_tiny)
        for _, r in got.iterrows():
            nt, nm, nmt, nk, nr = agg[r["source"]]
            assert (
                r["n_tokens"],
                r["n_masked"],
                r["n_mask_tok"],
                r["n_keep"],
                r["n_random"],
            ) == (nt, nm, nmt, nk, nr)
            assert abs(r["mask_rate"] - nm / nt) < 1e-6

    def test_fates_partition_masked(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_mlm_masks

        got = q_mlm_masks(sf_tiny)
        assert (
            got["n_mask_tok"] + got["n_keep"] + got["n_random"] == got["n_masked"]
        ).all()
        # the plan lands near the 15% design rate corpus-wide
        rate = got["n_masked"].sum() / got["n_tokens"].sum()
        assert 0.10 < rate < 0.20


class TestPreferencePairs:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PREF_PAIRS_PER_SOURCE,
            q_preference_pairs,
            q_quality_scores,
        )

        qual = q_quality_scores(sf_tiny)[["doc_id", "quality"]]
        src = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"]
        )
        df = qual.merge(src, on="doc_id")
        exp = []
        for source, g in df.groupby("source"):
            g = g.sort_values(
                ["quality", "doc_id"], ascending=[False, True]
            ).reset_index(drop=True)
            m = len(g) // 2
            for r in range(1, min(PREF_PAIRS_PER_SOURCE, len(g) - m) + 1):
                ch, rj = g.iloc[r - 1], g.iloc[r - 1 + m]
                gap = round(ch["quality"] - rj["quality"], 6)
                if gap > 0:
                    exp.append(
                        (source, r, int(ch["doc_id"]), int(rj["doc_id"]), gap)
                    )
        got = q_preference_pairs(sf_tiny)
        assert [
            (r["source"], r["pair_idx"], r["chosen_id"], r["rejected_id"], r["gap"])
            for _, r in got.iterrows()
        ] == exp

    def test_chosen_strictly_better(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_preference_pairs

        got = q_preference_pairs(sf_tiny)
        assert len(got) > 0
        assert (got["q_chosen"] > got["q_rejected"]).all()
        assert (got["gap"] > 0).all()
        assert (got["chosen_id"] != got["rejected_id"]).all()
