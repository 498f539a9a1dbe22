"""Brute-force identity tests for the data-mixture / eval-curve wave
(temperature mixing with water-filling, recall@k; registry 437-438)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _source_tokens(sf_dir: str) -> pd.Series:
    from searchengine_ray.analysis.stopwords import STOP_WORDS

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])
    cnt: dict[str, int] = {}
    for _, r in docs.iterrows():
        n = len(
            [
                t
                for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if t and t not in STOP_WORDS
            ]
        )
        cnt[r["source"]] = cnt.get(r["source"], 0) + n
    return pd.Series(cnt).sort_index()


def _waterfill(ns: np.ndarray, budget: float, emax: float):
    clipped = np.zeros(len(ns), bool)
    rem = budget
    for _ in range(len(ns)):
        denom = np.sqrt(ns[~clipped]).sum()
        alloc = rem * np.sqrt(ns) / denom
        newly = (~clipped) & (alloc > emax * ns)
        if not newly.any():
            break
        rem -= emax * ns[newly].sum()
        clipped |= newly
    denom = np.sqrt(ns[~clipped]).sum()
    alloc = np.where(clipped, emax * ns, rem * np.sqrt(ns) / denom)
    return alloc, clipped


class TestDataMixture:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            MIX_BUDGET_FRAC,
            MIX_MAX_EPOCHS,
            q_data_mixture,
        )

        per = _source_tokens(sf_tiny)
        ns = per.to_numpy(float)
        alloc, clipped = _waterfill(ns, MIX_BUDGET_FRAC * ns.sum(), MIX_MAX_EPOCHS)
        got = q_data_mixture(sf_tiny)
        assert list(got["source"]) == list(per.index)
        assert list(got["n_tokens"]) == list(per.astype(int))
        assert np.allclose(got["alloc_tokens"], alloc, atol=1e-4)
        assert list(got["clipped"]) == list(clipped.astype(int))
        # budget is conserved
        from searchengine_ray.pipelines.queries import MIX_BUDGET_FRAC as F

        assert abs(got["alloc_tokens"].sum() - F * ns.sum()) < 1e-2

    def test_clipping_fires_and_conserves(self, ray_session, sf_tiny, monkeypatch):
        import searchengine_ray.pipelines.q_training as Q

        monkeypatch.setattr(Q, "MIX_MAX_EPOCHS", 0.52)
        per = _source_tokens(sf_tiny)
        ns = per.to_numpy(float)
        alloc, clipped = _waterfill(ns, Q.MIX_BUDGET_FRAC * ns.sum(), 0.52)
        got = Q.q_data_mixture(sf_tiny)
        assert clipped.any(), "test setup: cap must bind for some source"
        assert list(got["clipped"]) == list(clipped.astype(int))
        assert np.allclose(got["alloc_tokens"], alloc, atol=1e-4)
        assert (got["epochs"] <= 0.52 + 1e-6).all()


class TestEvalRecall:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            EVAL_RECALL_KS,
            _engine,
            q_eval_recall,
        )

        eng = _engine(sf_tiny)
        got = q_eval_recall(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            res = eng.search_tfidf(terms, None)
            docs = np.asarray([d for d, _ in res], np.int64)
            scores = np.asarray([round(s, 6) for _, s in res], np.float64)
            ranked = docs[np.lexsort((docs, -scores))]
            full = set.intersection(
                *[set(int(x) for x in eng.search_keyword(t)) for t in terms]
            )
            rel = np.asarray([int(d) in full for d in ranked], bool)
            cum = np.cumsum(rel)
            for k in EVAL_RECALL_KS:
                row = got[(got["qid"] == qid) & (got["k"] == k)].iloc[0]
                hits = int(cum[min(k, len(ranked)) - 1])
                assert row["rel_in_topk"] == hits
                assert abs(row["recall"] - hits / len(full)) < 1e-6
                assert abs(row["precision"] - hits / k) < 1e-6

    def test_monotone_in_k(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_eval_recall

        got = q_eval_recall(sf_tiny)
        for _, g in got.groupby("qid"):
            g = g.sort_values("k")
            assert g["rel_in_topk"].is_monotonic_increasing
            assert g["recall"].is_monotonic_increasing
