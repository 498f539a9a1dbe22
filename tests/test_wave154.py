"""Wave 154: DFR PL2 and pivoted length-normalisation ranking —
engine results vs independent brute-force recomputation from the raw
corpus (the same verification contract as QL/BM25)."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd
import pytest


def _tok_by_doc(engine, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return {int(d): engine.analyze(t) for d, t in zip(docs["doc_id"], docs["text"])}


class TestDfrPl2:
    def _brute(self, engine, toks_by_doc, query, c):
        qtoks = engine.analyze(query)
        qn = collections.Counter(qtoks)
        df = collections.Counter()
        cf = collections.Counter()
        for toks in toks_by_doc.values():
            cf.update(toks)
            df.update(set(toks))
        n = len(toks_by_doc)
        avgdl = sum(len(t) for t in toks_by_doc.values()) / n
        qterms = [t for t in dict.fromkeys(qtoks) if cf[t] > 0]
        log2e = 1.0 / math.log(2.0)
        out = {}
        for d, toks in toks_by_doc.items():
            tf = collections.Counter(toks)
            dl = len(toks)
            s = 0.0
            hit = False
            for t in qterms:
                if tf[t] == 0:
                    continue
                hit = True
                tfn = tf[t] * math.log2(1.0 + c * avgdl / dl)
                lam = cf[t] / n
                s += (
                    qn[t]
                    / (tfn + 1.0)
                    * (
                        tfn * math.log2(tfn / lam)
                        + (lam - tfn) * log2e
                        + 0.5 * math.log2(2.0 * math.pi * tfn)
                    )
                )
            if hit:
                out[d] = s
        return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))

    @pytest.mark.parametrize("query", ["hash join scan", "merge", "query window"])
    def test_matches_brute_force(self, ray_session, sf_tiny, query):
        from searchengine_ray.pipelines.queries import _engine

        eng = _engine(sf_tiny, "punct")
        toks = _tok_by_doc(eng, sf_tiny)
        got = eng.search_dfr_pl2(query, c=1.0, topk=None)
        want = self._brute(eng, toks, query, 1.0)
        assert [d for d, _ in got] == [d for d, _ in want]
        assert np.allclose([s for _, s in got], [s for _, s in want], rtol=1e-10)

    def test_topk_prefix_and_oov(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import _engine

        eng = _engine(sf_tiny, "punct")
        full = eng.search_dfr_pl2("hash join scan", topk=None)
        assert eng.search_dfr_pl2("hash join scan", topk=5) == full[:5]
        assert eng.search_dfr_pl2("zzzunseen") == []
        assert eng.search_dfr_pl2("hash join scan", topk=0) == []
        # an OOV term alongside real terms changes nothing
        with_oov = eng.search_dfr_pl2("hash join scan zzzunseen", topk=None)
        assert with_oov == full


class TestPivotedNorm:
    def _brute(self, engine, toks_by_doc, query, s):
        qtoks = engine.analyze(query)
        qn = collections.Counter(qtoks)
        df = collections.Counter()
        for toks in toks_by_doc.values():
            df.update(set(toks))
        n = len(toks_by_doc)
        avgdl = sum(len(t) for t in toks_by_doc.values()) / n
        qterms = [t for t in dict.fromkeys(qtoks) if df[t] > 0]
        out = {}
        for d, toks in toks_by_doc.items():
            tf = collections.Counter(toks)
            dl = len(toks)
            sc = 0.0
            hit = False
            for t in qterms:
                if tf[t] == 0:
                    continue
                hit = True
                sc += (
                    qn[t]
                    * (1.0 + math.log(1.0 + math.log(tf[t])))
                    / ((1.0 - s) + s * dl / avgdl)
                    * math.log((n + 1.0) / df[t])
                )
            if hit:
                out[d] = sc
        return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))

    @pytest.mark.parametrize("query", ["window merge sort", "scan scan fast"])
    @pytest.mark.parametrize("s", [0.05, 0.2])
    def test_matches_brute_force(self, ray_session, sf_tiny, query, s):
        from searchengine_ray.pipelines.queries import _engine

        eng = _engine(sf_tiny, "punct")
        toks = _tok_by_doc(eng, sf_tiny)
        got = eng.search_pivoted(query, s=s, topk=None)
        want = self._brute(eng, toks, query, s)
        assert [d for d, _ in got] == [d for d, _ in want]
        assert np.allclose([s_ for _, s_ in got], [s_ for _, s_ in want], rtol=1e-10)

    def test_length_bias_direction(self, ray_session, sf_tiny):
        """With larger s, longer documents are penalised harder: the
        pivoted weight of a fixed (tf, dl) decreases in s when
        dl > avgdl and increases when dl < avgdl."""
        from searchengine_ray.pipelines.queries import _engine

        eng = _engine(sf_tiny, "punct")
        lo = dict(eng.search_pivoted("merge", s=0.01, topk=None))
        hi = dict(eng.search_pivoted("merge", s=0.6, topk=None))
        assert set(lo) == set(hi)  # same candidates, different weighting
        assert lo and any(abs(lo[d] - hi[d]) > 1e-9 for d in lo)
