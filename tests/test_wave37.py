"""Brute-force identity tests for the Naive-Bayes and decision-stump
wave (registry 263-264)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestNaiveBayes:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import q_naive_bayes_lang

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "lang", "text"])
        toks = _token_lists(docs["text"])
        train = docs["doc_id"] % 2 == 0
        counts: dict[str, dict[str, int]] = {}
        for lg, ts in zip(docs.loc[train, "lang"], [t for t, m in zip(toks, train) if m]):
            d = counts.setdefault(lg, {})
            for t in ts:
                d[t] = d.get(t, 0) + 1
        langs = sorted(counts)
        vocab = {t for d in counts.values() for t in d}
        V = len(vocab)
        n_c = {lg: sum(d.values()) for lg, d in counts.items()}
        n_docs_tr = int(train.sum())
        prior = {
            lg: math.log((docs.loc[train, "lang"] == lg).sum() / n_docs_tr)
            for lg in langs
        }
        conf: dict[tuple, int] = {}
        for is_tr, lg, ts in zip(train, docs["lang"], toks):
            if is_tr:
                continue
            best, best_s = None, None
            for cand in langs:
                s = prior[cand]
                for t in ts:
                    if t in vocab:
                        s += math.log(
                            (counts[cand].get(t, 0) + 1.0) / (n_c[cand] + V)
                        )
                if best_s is None or s > best_s + 1e-12:
                    best, best_s = cand, s
            conf[(lg, best)] = conf.get((lg, best), 0) + 1
        got = q_naive_bayes_lang(sf_tiny)
        got_map = {
            (r.true_lang, r.pred_lang): int(r.n) for r in got.itertuples()
        }
        assert got_map == conf
        # every test doc classified exactly once
        n_test = int((~train).sum())
        assert int(got["n"].sum()) == n_test


class TestDecisionStump:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_decision_stump

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["n_chars", "lang"])
        v = docs["n_chars"].to_numpy(np.int64)
        y = (docs["lang"] == "en").to_numpy()
        best = None
        for pol in (0, 1):
            for t in np.unique(v):
                pred = (v <= t) if pol == 0 else (v > t)
                err = int((pred != y).sum())
                key = (err, pol, int(t))
                if best is None or key < best:
                    best = key
        got = q_decision_stump(sf_tiny)
        assert int(got["errors"].iloc[0]) == best[0]
        assert int(got["polarity"].iloc[0]) == best[1]
        assert int(got["threshold"].iloc[0]) == best[2]
        assert int(got["n"].iloc[0]) == len(v)
        # a stump can never do worse than majority class
        assert best[0] <= min(int(y.sum()), int((~y).sum()))
