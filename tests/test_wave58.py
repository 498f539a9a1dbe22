"""Brute-force identity tests for the Huffman/consistent-hashing wave
(registry 313-314)."""

from __future__ import annotations

import hashlib
import heapq
import math

import numpy as np
import pandas as pd
import pytest


class TestHuffmanCode:
    def test_matches_heapq_huffman(self, ray_session, sf_tiny):
        # independent heap-based Huffman with the same (weight, id)
        # tie-break must give identical code lengths
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import HUFF_K, q_huffman_code

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        counts: dict[str, int] = {}
        for ts in _token_lists(docs["text"]):
            for t in ts:
                counts[t] = counts.get(t, 0) + 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:HUFF_K]
        heap = [(c, i, [i]) for i, (_, c) in enumerate(top)]
        heapq.heapify(heap)
        dep = [0] * HUFF_K
        nid = HUFF_K
        while len(heap) > 1:
            w1, _, m1 = heapq.heappop(heap)
            w2, _, m2 = heapq.heappop(heap)
            for j in m1 + m2:
                dep[j] += 1
            heapq.heappush(heap, (w1 + w2, nid, m1 + m2))
            nid += 1
        got = q_huffman_code(sf_tiny)
        assert list(got["term"]) == [t for t, _ in top]
        assert list(got["c"]) == [c for _, c in top]
        assert list(got["code_len"]) == dep

    def test_kraft_and_entropy_bound(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_huffman_code

        got = q_huffman_code(sf_tiny)
        # Kraft equality for a full binary code tree
        assert sum(2.0 ** -l for l in got["code_len"]) == pytest.approx(1.0)
        e = got["expected_bits"].iloc[0]
        h = got["entropy_bits"].iloc[0]
        assert h - 1e-5 <= e <= h + 1.0 + 1e-5  # Huffman optimality band


class TestConsistentHashing:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import (
            CH_NODES,
            CH_VNODES,
            q_consistent_hashing,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        vocab = sorted({t for ts in _token_lists(docs["text"]) for t in ts})

        def md5low(s: str) -> int:
            return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")

        def owner(h: int, n_nodes: int) -> int:
            ring = sorted(
                (md5low(f"n{i}#v{j}"), i)
                for i in range(n_nodes)
                for j in range(CH_VNODES)
            )
            for pos, node in ring:
                if pos >= h:
                    return node
            return ring[0][1]

        got = q_consistent_hashing(sf_tiny).set_index("node")
        hs = [md5low(t) for t in vocab]
        o8 = [owner(h, CH_NODES) for h in hs]
        o9 = [owner(h, CH_NODES + 1) for h in hs]
        for node in range(CH_NODES + 1):
            row = got.loc[node]
            assert row["keys_before"] == (
                sum(1 for o in o8 if o == node) if node < CH_NODES else 0
            )
            assert row["keys_after"] == sum(1 for o in o9 if o == node)
            assert row["moved_in"] == sum(
                1 for a, b in zip(o8, o9) if b == node and a != b
            )

    def test_movement_bounded(self, ray_session, sf_tiny):
        # consistent hashing moves keys ONLY onto the new node
        from searchengine_ray.pipelines.queries import CH_NODES, q_consistent_hashing

        got = q_consistent_hashing(sf_tiny)
        total = got["keys_after"].sum()
        assert got["keys_before"].sum() == total
        old = got[got["node"] < CH_NODES]
        assert (old["moved_in"] == 0).all()
        new = got[got["node"] == CH_NODES].iloc[0]
        assert new["moved_in"] == new["keys_after"]
        # the join should take roughly 1/(n+1) of keys, not a hot slice
        assert new["keys_after"] < 0.5 * total
