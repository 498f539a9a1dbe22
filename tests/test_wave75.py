"""Brute-force identity tests for the ranking-features wave
(LTR export + sequential dependence model, registry 347-348)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest


def _raw_split(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return re.split(r"[ \t\n\x0b\f\r]+", t)


def _round_half_away(x: float, nd: int = 6) -> float:
    p = 10.0**nd
    return math.copysign(math.floor(abs(x) * p + 0.5) / p, x)


class TestLtrFeatures:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            BM25F_TITLE_K,
            EVAL_QUERIES,
            LTR_TOPK,
            q_ltr_features,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        qset = {t for q in EVAL_QUERIES for t in q}
        N = len(docs)
        dls, tf, ttf = {}, {t: {} for t in qset}, {t: {} for t in qset}
        for did, text in zip(docs["doc_id"], docs["text"]):
            raw = _raw_split(text)
            ft = [t for t in raw if t and t not in STOP_WORDS]
            dls[int(did)] = len(ft)
            for t in ft:
                if t in qset:
                    tf[t][int(did)] = tf[t].get(int(did), 0) + 1
            for t in raw[:BM25F_TITLE_K]:
                if t in qset:
                    ttf[t][int(did)] = ttf[t].get(int(did), 0) + 1
        avgdl = sum(dls.values()) / N
        got = q_ltr_features(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            rows: dict[int, dict] = {}
            for t in terms:
                df = len(tf[t])
                if df == 0:
                    continue
                idf_bm = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
                idf10 = math.log10(N / df + 1.0)
                for d, f in tf[t].items():
                    r = rows.setdefault(
                        d, {"bm25": 0.0, "dot": 0.0, "len2": 0.0, "nm": 0, "tt": 0}
                    )
                    r["bm25"] += (
                        2.2
                        * idf_bm
                        * f
                        / (f + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
                    )
                    r["dot"] += (f * idf10) * idf10
                    r["len2"] += (f * idf10) ** 2
                    r["nm"] += 1
                    # title tf only counts if the term matched the doc
                    r["tt"] += ttf[t].get(d, 0)
            ranked = sorted(
                ((_round_half_away(v["bm25"]), d) for d, v in rows.items()),
                key=lambda x: (-x[0], x[1]),
            )[:LTR_TOPK]
            sub = got[got["qid"] == qid].reset_index(drop=True)
            assert sub["doc_id"].tolist() == [d for _, d in ranked]
            for rk, (bm, d) in enumerate(ranked, 1):
                row = sub.iloc[rk - 1]
                v = rows[d]
                assert row["rank"] == rk
                assert row["bm25"] == pytest.approx(bm, abs=5.1e-7)
                assert row["tfidf"] == pytest.approx(
                    _round_half_away(v["dot"] / math.sqrt(v["len2"])), abs=5.1e-7
                )
                assert row["dl"] == dls[d]
                assert row["n_matched"] == v["nm"]
                assert row["title_tf"] == v["tt"]

    def test_feature_sanity(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ltr_features

        got = q_ltr_features(sf_tiny)
        assert (got["bm25"] > 0).all()
        assert (got["n_matched"] >= 1).all()
        assert (got["title_tf"] <= got["dl"]).all()


class TestSdmRank:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            SDM_MU,
            SDM_W,
            SDM_WINDOW,
            q_sdm_rank,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        qset = {t for q in EVAL_QUERIES for t in q}
        pairs = sorted({(a, b) for q in EVAL_QUERIES for a, b in zip(q, q[1:])})
        dls: dict[int, int] = {}
        tcnt: dict[tuple, int] = {}
        ocnt: dict[tuple, int] = {}
        ucnt: dict[tuple, int] = {}
        for did, text in zip(docs["doc_id"], docs["text"]):
            toks = _raw_split(text)
            pos = {
                t: [i for i, x in enumerate(toks, 1) if x == t] for t in qset
            }
            dls[int(did)] = sum(1 for t in toks if t)
            for t, p in pos.items():
                if p:
                    tcnt[(t, int(did))] = len(p)
            for a, b in pairs:
                o = sum(1 for i in pos[a] if i + 1 in pos[b])
                u = sum(
                    1
                    for i in pos[a]
                    for j in pos[b]
                    if 0 < abs(i - j) < SDM_WINDOW
                )
                if o:
                    ocnt[(a, b, int(did))] = o
                if u:
                    ucnt[(a, b, int(did))] = u
        C = float(sum(dls.values()))
        cft = {t: sum(v for (x, _), v in tcnt.items() if x == t) for t in qset}
        cfo = {
            p: sum(v for (a, b, _), v in ocnt.items() if (a, b) == p)
            for p in pairs
        }
        cfu = {
            p: sum(v for (a, b, _), v in ucnt.items() if (a, b) == p)
            for p in pairs
        }
        w_t, w_o, w_u = SDM_W
        got = q_sdm_rank(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            cand = {
                d for (t, d) in tcnt if t in terms
            }
            scores = {}
            for d in cand:
                st = sum(
                    math.log(
                        (tcnt.get((t, d), 0) + SDM_MU * cft[t] / C)
                        / (dls[d] + SDM_MU)
                    )
                    for t in terms
                    if cft[t] > 0
                )
                so = sum(
                    math.log(
                        (ocnt.get((a, b, d), 0) + SDM_MU * cfo[(a, b)] / C)
                        / (dls[d] + SDM_MU)
                    )
                    for a, b in zip(terms, terms[1:])
                    if cfo[(a, b)] > 0
                )
                su = sum(
                    math.log(
                        (ucnt.get((a, b, d), 0) + SDM_MU * cfu[(a, b)] / C)
                        / (dls[d] + SDM_MU)
                    )
                    for a, b in zip(terms, terms[1:])
                    if cfu[(a, b)] > 0
                )
                scores[d] = _round_half_away(w_t * st + w_o * so + w_u * su)
            top = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:10]
            sub = got[got["qid"] == qid].reset_index(drop=True)
            assert sub["doc_id"].tolist() == [d for d, _ in top]
            for rk, (d, s) in enumerate(top, 1):
                assert sub.iloc[rk - 1]["score"] == pytest.approx(s, abs=5.1e-7)

    def test_proximity_changes_order(self, ray_session, sf_tiny):
        """SDM and plain unigram QL must be close but the window
        features must actually contribute (collection has adjacent
        query bigrams)."""
        from searchengine_ray.pipelines.queries import q_sdm_rank

        got = q_sdm_rank(sf_tiny)
        assert got.groupby("qid").size().eq(10).all()
        assert (got["score"] < 0).all()  # log-likelihoods
