"""Brute-force identity tests for the durability/dissemination wave
(WAL chain + gossip, registry 389-390)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


class TestWalChain:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            WAL_SAMPLE,
            WAL_STRIDE,
            q_wal_chain,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        recs = [
            (hashlib.md5(t.encode()).hexdigest(), hashlib.md5(t[::-1].encode()).hexdigest())
            for d, t in zip(docs["doc_id"], docs["text"])
            if d % WAL_STRIDE == 0
        ]
        n = len(recs)
        k = n // 2
        cg = cb = "genesis"
        exp = []
        for i, (g, b) in enumerate(recs):
            cg = hashlib.md5((cg + g).encode()).hexdigest()
            cb = hashlib.md5((cb + (b if i == k else g)).encode()).hexdigest()
            if i % WAL_SAMPLE == 0 or i == n - 1:
                exp.append((i, cg, cb, int(cg != cb)))
        got = q_wal_chain(sf_tiny)
        assert list(got.itertuples(index=False, name=None)) == exp

    def test_divergence_is_sticky(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_wal_chain

        got = q_wal_chain(sf_tiny).sort_values("rec")
        d = got["diverged"].to_numpy()
        # once diverged, forever diverged (the chain property)
        assert (np.diff(d) >= 0).all()
        assert d[0] == 0 and d[-1] == 1


class TestGossipRounds:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            GOSSIP_CAP,
            GOSSIP_N,
            q_gossip_rounds,
        )

        n_docs = len(
            pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        )
        informed = {n_docs % GOSSIP_N}
        exp = [(0, 1, 1)]
        for r in range(1, GOSSIP_CAP + 1):
            t = {(i * 3 + r * 7) % GOSSIP_N for i in informed}
            new = t - informed
            informed |= t
            exp.append((r, len(informed), len(new)))
            if len(informed) == GOSSIP_N:
                break
        got = q_gossip_rounds(sf_tiny)
        assert list(got.itertuples(index=False, name=None)) == exp

    def test_gossip_shape(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import GOSSIP_N, q_gossip_rounds

        got = q_gossip_rounds(sf_tiny).sort_values("round")
        inf = got["n_informed"].to_numpy()
        # monotone growth, full dissemination, log-ish round count
        assert (np.diff(inf) >= 0).all()
        assert inf[-1] == GOSSIP_N
        assert len(got) <= 3 * int(np.ceil(np.log2(GOSSIP_N))) + 2
