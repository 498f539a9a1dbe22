"""Bloom filter, skyline, edit-1 blocking, A/B z-test, Gram matrix —
algorithmic invariants beyond the DuckDB gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestBloom:
    def test_no_false_negatives_and_fp_envelope(self, ray_session, sf_tiny):
        from searchengine_ray.functions.sketches import BLOOM_K, BLOOM_M, bloom_probe
        from searchengine_ray.pipelines.queries import q_bloom_filter

        bits = q_bloom_filter(sf_tiny)
        keys = pd.read_parquet(f"{sf_tiny}/customer.parquet", columns=["c_custkey"])[
            "c_custkey"
        ].to_numpy()
        assert bloom_probe(bits, keys).all(), "Bloom must never reject a member"
        probe = np.arange(10_000_000, 10_020_000)
        fp = bloom_probe(bits, probe).mean()
        # theoretical fp ~ (1 - e^{-kn/m})^k; allow 3x slack
        n = len(keys)
        bound = (1 - np.exp(-BLOOM_K * n / BLOOM_M)) ** BLOOM_K
        assert fp <= 3 * bound + 1e-3

    def test_partial_bits_union_equals_global(self, ray_session):
        from searchengine_ray.functions.sketches import bloom_bits_batch

        vals = np.arange(1000, dtype=np.int64)
        whole = bloom_bits_batch(pa.table({"v": pa.array(vals)}), "v")["bit"].to_numpy()
        a = bloom_bits_batch(pa.table({"v": pa.array(vals[:500])}), "v")["bit"].to_numpy()
        b = bloom_bits_batch(pa.table({"v": pa.array(vals[500:])}), "v")["bit"].to_numpy()
        assert set(whole) == set(a) | set(b)


class TestSkyline:
    def test_mask_matches_bruteforce(self):
        from searchengine_ray.pipelines.queries import _skyline2_mask

        rng = np.random.RandomState(7)
        price = rng.randint(0, 50, 300).astype(np.float64)
        size = rng.randint(0, 50, 300).astype(np.float64)
        mask = _skyline2_mask(price, size)
        for i in range(300):
            dominated = bool(
                np.any(
                    (price <= price[i])
                    & (size <= size[i])
                    & ((price < price[i]) | (size < size[i]))
                )
            )
            assert mask[i] == (not dominated), i

    def test_merge_of_local_fronts_is_global(self):
        from searchengine_ray.pipelines.queries import _skyline2_mask

        rng = np.random.RandomState(3)
        price = rng.rand(500)
        size = rng.rand(500)
        global_mask = _skyline2_mask(price, size)
        # split into 5 blocks, take local fronts, merge
        parts = []
        for lo in range(0, 500, 100):
            m = _skyline2_mask(price[lo:lo + 100], size[lo:lo + 100])
            parts.append((price[lo:lo + 100][m], size[lo:lo + 100][m]))
        mp = np.concatenate([p for p, _ in parts])
        ms = np.concatenate([s for _, s in parts])
        merged = _skyline2_mask(mp, ms)
        got = sorted(zip(mp[merged], ms[merged]))
        expect = sorted(zip(price[global_mask], size[global_mask]))
        assert got == expect


class TestEdit1:
    @pytest.mark.parametrize(
        "a,b,want",
        [
            ("cat", "cut", True),
            ("cat", "cats", True),
            ("cat", "at", True),
            ("cat", "cat", False),
            ("cat", "dog", False),
            ("cat", "catty", False),
            ("abc", "acb", False),
        ],
    )
    def test_cases(self, a, b, want):
        from searchengine_ray.pipelines.queries import _edit1

        assert _edit1(a, b) is want

    def test_blocking_is_complete(self):
        """Any ed-1 pair shares a single-deletion key (incl. identity)."""
        from searchengine_ray.pipelines.queries import _edit1

        words = ["slow", "slot", "low", "glow", "slows", "flow", "sow"]
        def keys(w):
            return {w} | {w[:i] + w[i + 1:] for i in range(len(w))}

        for i in range(len(words)):
            for j in range(i + 1, len(words)):
                if _edit1(words[i], words[j]):
                    assert keys(words[i]) & keys(words[j]), (words[i], words[j])


class TestGram:
    def test_matches_numpy(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_embedding_gram

        out = q_embedding_gram(sf_tiny)
        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet")["embedding"]
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        gram = mat.T @ mat
        d = mat.shape[1]
        assert len(out) == d * (d + 1) // 2
        got = out.set_index(["i", "j"])["g"]
        for (i, j), v in got.items():
            assert abs(v - gram[i - 1, j - 1]) < 1e-4, (i, j)


class TestAbZtest:
    def test_z_zero_when_arms_identical(self, ray_session):
        from searchengine_ray.pipelines.queries import round_half_away

        # symmetric contingency: z must be exactly 0
        xa, na, xb, nb = 50, 100, 50, 100
        p1, p2 = xa / na, xb / nb
        pp = (xa + xb) / (na + nb)
        z = (p1 - p2) / np.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
        assert round_half_away(z, 6) == 0.0
