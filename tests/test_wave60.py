"""Brute-force identity tests for the RBO/mutual-kNN wave
(registry 317-318)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest




class TestMutualKnn:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import MUTUAL_TOPK, q_mutual_knn

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet")
        ids = emb["vec_id"].to_numpy(np.int64)
        mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(mat, axis=1)
        cos = np.round((mat @ mat.T) / np.outer(n, n), 6)
        best = {}
        bestc = {}
        for i in range(len(ids)):
            row = cos[i].copy()
            row[i] = -2.0
            j = np.lexsort((ids, -row))[0]
            best[int(ids[i])] = int(ids[j])
            bestc[int(ids[i])] = float(row[j])
        pairs = [
            (a, b, bestc[a])
            for a, b in best.items()
            if a < b and best.get(b) == a
        ]
        pairs.sort(key=lambda r: (-r[2], r[0]))
        got = q_mutual_knn(sf_tiny)
        assert got["n_mutual"].iloc[0] == len(pairs)
        for (a, b, c), row in zip(pairs[:MUTUAL_TOPK], got.itertuples()):
            assert (row.vec_a, row.vec_b) == (a, b)
            assert row.cosine == pytest.approx(c, abs=1e-6)

    def test_pairs_are_mutual_and_ordered(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_mutual_knn

        got = q_mutual_knn(sf_tiny)
        assert (got["vec_a"] < got["vec_b"]).all()
        assert (np.diff(got["cosine"].to_numpy()) <= 1e-12).all()
        assert (got["cosine"] <= 1.0).all()
