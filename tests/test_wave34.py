"""Brute-force identity tests for the cross-entropy and set-cover wave
(registry 256-257)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestCrossEntropySources:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import q_cross_entropy_sources

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "text"])
        counts: dict[str, dict[str, int]] = {}
        for s, ts in zip(docs["source"], _token_lists(docs["text"])):
            d = counts.setdefault(s, {})
            for t in ts:
                d[t] = d.get(t, 0) + 1
        srcs = sorted(counts)[:3]
        vocab = len({t for s in srcs for t in counts[s]})
        got = q_cross_entropy_sources(sf_tiny).set_index(["train_source", "eval_source"])
        for tr in srcs:
            n_tr = sum(counts[tr].values())
            for ev in srcs:
                if ev == tr:
                    continue
                num = 0.0
                den = 0
                for t, c in counts[ev].items():
                    p = (counts[tr].get(t, 0) + 1.0) / (n_tr + vocab)
                    num -= c * math.log(p)
                    den += c
                assert abs(got.loc[(tr, ev), "cross_entropy"] - num / den) < 1e-5

    def test_output_shape_and_positivity(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cross_entropy_sources

        got = q_cross_entropy_sources(sf_tiny)
        assert (got["cross_entropy"] > 0).all()
        assert len(got) == 6  # 3 sources, ordered pairs


class TestSetCover:
    def test_matches_greedy_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import SET_COVER_K, q_set_cover_docs

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        sets = {
            int(d): {f"{a} {b}" for a, b in zip(ts, ts[1:])}
            for d, ts in zip(docs["doc_id"], _token_lists(docs["text"]))
        }
        covered: set = set()
        expect = []
        for rank in range(1, SET_COVER_K + 1):
            gains = {d: len(s - covered) for d, s in sets.items() if len(s - covered)}
            if not gains:
                break
            best = min(gains, key=lambda d: (-gains[d], d))
            covered |= sets[best]
            expect.append((rank, best, gains[best], len(covered)))
        got = q_set_cover_docs(sf_tiny)
        assert [tuple(int(x) for x in r) for r in got.itertuples(index=False)] == expect

    def test_coverage_is_monotone_and_diminishing(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_set_cover_docs

        got = q_set_cover_docs(sf_tiny)
        gains = got["new_terms"].to_numpy()
        assert (np.diff(got["covered_total"].to_numpy()) == gains[1:]).all()
        # greedy gains are non-increasing
        assert (np.diff(gains) <= 0).all()
