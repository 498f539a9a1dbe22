"""Brute-force identity tests for the integrity/quantization wave
(Merkle root + binary ANN, registry 345-346)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _merkle_levels(hashes: list[str]) -> list[list[str]]:
    levels = [hashes]
    while len(levels[-1]) > 1:
        prev = levels[-1]
        nxt = []
        for i in range(0, len(prev), 2):
            if i + 1 < len(prev):
                nxt.append(hashlib.md5((prev[i] + prev[i + 1]).encode()).hexdigest())
            else:
                nxt.append(prev[i])
        levels.append(nxt)
    return levels


class TestMerkleRoot:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import MERKLE_TOP, q_merkle_root

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        leaves = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in docs["text"]
        ]
        levels = _merkle_levels(leaves)
        exp = []
        for lvl, nodes in enumerate(levels):
            if len(nodes) <= MERKLE_TOP:
                exp.extend((lvl, i, h) for i, h in enumerate(nodes))
        got = q_merkle_root(sf_tiny)
        assert list(got.itertuples(index=False, name=None)) == exp

    def test_root_detects_mutation(self):
        a = _merkle_levels([hashlib.md5(f"d{i}".encode()).hexdigest() for i in range(11)])
        b_leaves = [hashlib.md5(f"d{i}".encode()).hexdigest() for i in range(11)]
        b_leaves[7] = hashlib.md5(b"tampered").hexdigest()
        b = _merkle_levels(b_leaves)
        assert a[-1][0] != b[-1][0]
        # and the divergent path is locatable level by level
        assert sum(x != y for x, y in zip(a[1], b[1])) == 1


class TestBinaryAnn:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BINARY_ANN_QUERIES,
            q_binary_ann,
        )

        emb = pd.read_parquet(
            f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        mat = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
        ids = emb["vec_id"].to_numpy(np.int64)
        signs = mat >= 0
        norms = np.linalg.norm(mat, axis=1)
        got = q_binary_ann(sf_tiny)
        for q in BINARY_ANN_QUERIES:
            qv = mat[ids == q][0]
            ham = (signs != (qv >= 0)[None, :]).sum(axis=1)
            cos = mat @ qv / (norms * np.linalg.norm(qv))
            c6 = np.round(cos * 1e6).astype(np.int64)  # ties none in practice
            oh = np.lexsort((ids, ham))[:10]
            oc = np.lexsort((ids, -c6))[:10]
            cos_top = set(ids[oc].tolist())
            sub = got[got["qid"] == q].reset_index(drop=True)
            assert sub["vec_id"].tolist() == ids[oh].tolist()
            assert sub["hamming"].tolist() == ham[oh].tolist()
            assert sub["in_cos_top10"].tolist() == [
                int(v in cos_top) for v in ids[oh]
            ]
            assert sub["rank"].tolist() == list(range(1, 11))

    def test_query_is_own_best(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_binary_ann

        got = q_binary_ann(sf_tiny)
        first = got[got["rank"] == 1]
        # the query vector has Hamming distance 0 to itself and the
        # smallest vec_id tiebreak among distance-0 codes can only be
        # <= qid, so distance must be 0 at rank 1
        assert (first["hamming"] == 0).all()
        # sign codes carry real signal: recall@10 far above the 2%
        # chance rate (10 of ~500 vectors)
        assert got["in_cos_top10"].sum() >= len(got) // 5
