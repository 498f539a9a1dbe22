"""Brute-force identity tests for the numerics/convergence wave
(online softmax + PageRank residuals, registry 397-398)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestOnlineSoftmax:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            OSM_CHUNK,
            OSM_STRIDE,
            q_online_softmax,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        got = q_online_softmax(sf_tiny)
        for did, text in zip(docs["doc_id"], docs["text"]):
            if did % OSM_STRIDE != 0:
                continue
            cnt: dict[str, int] = {}
            for t in _raw_tokens(text):
                cnt[t] = cnt.get(t, 0) + 1
            xs = [float(cnt[t]) for t in sorted(cnt)]
            md = max(xs)
            direct = md + math.log(sum(math.exp(x - md) for x in xs))
            m, s = float("-inf"), 0.0
            for c0 in range(0, len(xs), OSM_CHUNK):
                chunk = xs[c0 : c0 + OSM_CHUNK]
                m2 = max(m, max(chunk))
                s2 = s * (math.exp(m - m2) if m != float("-inf") else 0.0)
                for x in chunk:
                    s2 += math.exp(x - m2)
                m, s = m2, s2
            stream = m + math.log(s)
            row = got[got["doc_id"] == did].iloc[0]
            assert row["n_terms"] == len(xs)
            assert abs(row["lse_micro"] - stream * 1e6) < 2
            assert row["delta_micro"] <= 1  # streaming == direct

    def test_streaming_equals_direct(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_online_softmax

        got = q_online_softmax(sf_tiny)
        # the FlashAttention identity: rescaled streaming is exact
        assert (got["delta_micro"] <= 1).all()
        # LSE dominates the max logit
        assert (got["lse_micro"] > 0).all()


class TestPagerankResiduals:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PRR_ITERS,
            q_pagerank_residuals,
        )

        n = len(
            pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        )
        ids = np.arange(n)
        E = np.concatenate(
            [
                np.stack([ids, (ids * 7 + 13) % n], 1),
                np.stack([ids, (ids * 31 + 5) % n], 1),
                np.stack([ids, ids % 10], 1),
            ]
        )
        E = E[E[:, 0] != E[:, 1]]
        src, dst = E[:, 0], E[:, 1]
        outdeg = np.bincount(src, minlength=n).astype(float)
        rank = np.ones(n)
        got = q_pagerank_residuals(sf_tiny)
        for it in range(1, PRR_ITERS + 1):
            contrib = np.zeros(n)
            np.add.at(contrib, dst, rank[src] / outdeg[src])
            new = 0.15 + 0.85 * contrib
            d = int(
                np.abs(
                    np.floor(np.abs(new * 1e6) + 0.5).astype(np.int64)
                    * np.sign(new).astype(np.int64)
                    - np.floor(np.abs(rank * 1e6) + 0.5).astype(np.int64)
                    * np.sign(rank).astype(np.int64)
                ).sum()
            )
            row = got[got["iter"] == it].iloc[0]
            assert row["l1_residual_micro"] == d
            rank = new

    def test_geometric_decay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_pagerank_residuals

        got = q_pagerank_residuals(sf_tiny).sort_values("iter")
        r = got["l1_residual_micro"].to_numpy(np.float64)
        # residuals decay roughly like the damping factor
        assert r[-1] < r[0] / 20
        # mostly monotone decreasing (tiny rounding jitter tolerated)
        assert (np.diff(r) <= r[:-1] * 0.05 + 2).all()
