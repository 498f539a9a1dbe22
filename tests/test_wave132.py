"""Brute-force identity tests for the enrichment/serving wave
(gazetteer tagging, cascade sizing; registry 461-462)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


class TestGazetteerTags:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import GAZETTEER, q_gazetteer_tags

        term2cls = {t: c for c, ts in GAZETTEER.items() for t in ts}
        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        agg: dict[tuple, list] = {}
        for _, r in docs.iterrows():
            toks = [
                t
                for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if t
            ]
            seen = set()
            for t in toks:
                c = term2cls.get(t)
                if not c:
                    continue
                k = (r["source"], c)
                a = agg.setdefault(k, [0, 0])
                a[1] += 1
                if k not in seen:
                    a[0] += 1
                    seen.add(k)
        got = q_gazetteer_tags(sf_tiny)
        assert len(got) == len(agg)
        for _, r in got.iterrows():
            nd, m = agg[(r["source"], r["cls"])]
            assert (r["n_docs"], r["mentions"]) == (nd, m)
            assert abs(r["mentions_per_doc"] - m / nd) < 1e-6

    def test_classes_cover(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import GAZETTEER, q_gazetteer_tags

        got = q_gazetteer_tags(sf_tiny)
        assert set(got["cls"]) <= set(GAZETTEER)
        assert (got["mentions"] >= got["n_docs"]).all()


class TestCascadePlan:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CASCADE_KS,
            CASCADE_RECALL_FLOOR,
            CASCADE_RERANK_US,
            CASCADE_SCAN_US,
            _mean_recall_at,
            q_cascade_plan,
        )

        got = q_cascade_plan(sf_tiny)
        chosen = None
        for k, (_, r) in zip(CASCADE_KS, got.iterrows()):
            mr = _mean_recall_at(sf_tiny, k)
            assert r["k"] == k
            assert abs(r["mean_recall"] - mr) < 1e-6
            assert r["cost_us"] == CASCADE_SCAN_US + k * CASCADE_RERANK_US
            if chosen is None and mr >= CASCADE_RECALL_FLOOR:
                chosen = k
        if chosen is None:
            chosen = CASCADE_KS[-1]
        assert list(got[got["chosen"] == 1]["k"]) == [chosen]

    def test_curve_monotone_single_choice(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cascade_plan

        got = q_cascade_plan(sf_tiny)
        assert got["mean_recall"].is_monotonic_increasing
        assert got["chosen"].sum() == 1
        assert got["cost_us"].is_monotonic_increasing
