"""Brute-force identity tests for the dedup-governance / chunking wave
(split family leak, chunk waste curve; registry 467-468)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd


class TestSplitFamilyLeak:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        import ray.data as rd

        from searchengine_ray.functions.dedup import ngram_jaccard_pairs
        from searchengine_ray.pipelines.queries import q_split_family_leak

        ds = rd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        pairs = ngram_jaccard_pairs(ds, threshold=0.5)
        parent: dict[int, int] = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
            union(int(a), int(b))
        fams: dict[int, list[int]] = {}
        nodes = set(pairs["doc_a"]) | set(pairs["doc_b"])
        for d in nodes:
            fams.setdefault(find(int(d)), []).append(int(d))

        def split_of(d):
            b = (
                int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:], "little")
                % 10
            )
            return "train" if b < 8 else ("val" if b == 8 else "test")

        got = q_split_family_leak(sf_tiny)
        exp = []
        for root in sorted(fams):
            ds_ = fams[root]
            if len(ds_) < 2:
                continue
            splits = sorted({split_of(d) for d in ds_})
            exp.append(
                (root, len(ds_), len(splits), ",".join(splits), int(len(splits) > 1))
            )
        assert [tuple(r) for r in got.itertuples(index=False, name=None)] == exp

    def test_leak_flag_consistent(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_split_family_leak

        got = q_split_family_leak(sf_tiny)
        assert ((got["leaky"] == 1) == (got["n_splits"] > 1)).all()
        assert (got["n_docs"] >= 2).all()


class TestChunkWasteCurve:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import CHUNK_SIZES, q_chunk_waste_curve

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        kept = []
        for t in docs["text"]:
            n = len(
                [
                    w
                    for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split()
                    if w and w not in STOP_WORDS
                ]
            )
            if n:
                kept.append(n)
        kept = np.asarray(kept, np.int64)
        got = q_chunk_waste_curve(sf_tiny)
        for c, (_, r) in zip(CHUNK_SIZES, got.iterrows()):
            ch = -(-kept // c)
            assert (r["chunk_size"], r["docs"], r["tokens"]) == (
                c,
                len(kept),
                int(kept.sum()),
            )
            assert r["chunks"] == int(ch.sum())
            assert r["waste"] == int((ch * c - kept).sum())
            assert abs(r["pad_share"] - (ch * c - kept).sum() / (ch.sum() * c)) < 1e-6

    def test_bigger_chunks_waste_more(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_chunk_waste_curve

        got = q_chunk_waste_curve(sf_tiny)
        assert got["chunks"].is_monotonic_decreasing
        assert got["waste"].is_monotonic_increasing
