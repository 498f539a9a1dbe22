"""Engine wave: JM query likelihood, filtered BM25, count-min sketch,
gzip JSONL roundtrip — identity and invariant tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def engine(ray_session, sf_tiny):
    from searchengine_ray.pipelines.queries import _engine

    return _engine(sf_tiny)


class TestQlJm:
    def test_brute_force_identity(self, engine, sf_tiny):
        """search_ql_jm matches a direct per-doc computation from the
        analyzed corpus."""
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        toks = {
            int(r.doc_id): engine.analyze(r.text) for r in docs.itertuples()
        }
        query = "query window join"
        qtoks = engine.analyze(query)
        lam = 0.5
        total = float(sum(len(v) for v in toks.values()))
        cf = {t: sum(v.count(t) for v in toks.values()) for t in set(qtoks)}
        got = dict(engine.search_ql_jm(query, lam=lam, topk=None))
        # candidates = docs containing >=1 query term
        for d, tv in toks.items():
            if not any(t in tv for t in qtoks):
                assert d not in got
                continue
            s = 0.0
            for t in qtoks:
                if cf[t] == 0:
                    continue
                tf = tv.count(t)
                s += np.log(lam * (tf / len(tv)) + (1.0 - lam) * cf[t] / total)
            assert got[d] == pytest.approx(s, abs=1e-9), d

    def test_ranking_differs_from_dirichlet_scores(self, engine):
        jm = engine.search_ql_jm("query window join", topk=5)
        dr = engine.search_ql_dirichlet("query window join", topk=5)
        assert jm and dr
        assert [s for _, s in jm] != [s for _, s in dr]


class TestBm25Filtered:
    def test_equals_postfilter_of_exhaustive(self, engine, sf_tiny):
        meta = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "lang"])
        allowed = np.sort(meta[meta["lang"] == "en"]["doc_id"].to_numpy(np.int64))
        q = "data search index"
        full = engine.search_bm25(q, topk=None, method="exhaustive")
        aset = set(allowed.tolist())
        expect = [(d, s) for d, s in full if d in aset]
        got = engine.search_bm25_filtered(q, allowed, topk=None)
        assert got == expect

    def test_empty_allowed(self, engine):
        assert engine.search_bm25_filtered("data", np.empty(0, np.int64), topk=10) == []




