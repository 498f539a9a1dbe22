"""Brute-force identity tests for the index-compression wave
(Elias-Fano codec + Roaring container audit, registry 339-340)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


def _postings(sf: str) -> tuple[dict[str, list[int]], int]:
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    post: dict[str, set[int]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        for t in set(_raw_tokens(text)):
            post.setdefault(t, set()).add(int(did))
    return {t: sorted(s) for t, s in post.items()}, int(docs["doc_id"].max()) + 1


class TestEliasFanoCodec:
    def test_roundtrip_random(self):
        from searchengine_ray.codec.eliasfano import decode, encode, encoded_size

        rng = np.random.default_rng(41)
        for _ in range(50):
            u = int(rng.integers(1, 100_000))
            n = int(rng.integers(1, min(u, 2000) + 1))
            ids = np.sort(rng.choice(u, size=n, replace=False)).astype(np.int64)
            data = encode(ids, u)
            assert len(data) == encoded_size(n, int(ids[-1]), u)
            assert np.array_equal(decode(data, n, u), ids)

    def test_low_bits_exact(self):
        from searchengine_ray.codec.eliasfano import low_bits

        for n in range(1, 40):
            for u in range(n, 200):
                assert low_bits(n, u) == max(0, math.floor(math.log2(u / n)))

    def test_rejects_bad_input(self):
        from searchengine_ray.codec.eliasfano import encode

        with pytest.raises(ValueError):
            encode(np.array([3, 3, 5], np.int64), 10)
        with pytest.raises(ValueError):
            encode(np.array([0, 12], np.int64), 10)

    def test_near_succinct(self):
        """EF never exceeds 2 + ceil(log2(U/n)) bits/elem (+ byte pad)."""
        from searchengine_ray.codec.eliasfano import encode

        rng = np.random.default_rng(5)
        u = 50_000
        for n in (10, 500, 5000):
            ids = np.sort(rng.choice(u, size=n, replace=False)).astype(np.int64)
            bound_bits = n * (2 + math.ceil(math.log2(u / n))) + 16
            assert len(encode(ids, u)) * 8 <= bound_bits




