"""Brute-force identity tests for the vector-search wave
(filtered ANN with overfetch, matryoshka recall; registry 485-486)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _emb(sf_dir):
    emb = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    ).sort_values("vec_id")
    ids = emb["vec_id"].to_numpy(np.int64)
    labels = emb["label"].to_numpy(np.int64)
    mat = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    return ids, labels, mat


class TestFilteredAnn:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            FANN_K,
            FANN_QUERIES,
            q_filtered_ann,
        )
        from searchengine_ray.pipelines.queries import round_half_away

        ids, labels, mat = _emb(sf_tiny)
        nrm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        got = q_filtered_ann(sf_tiny)
        for q in FANN_QUERIES:
            qv = nrm[ids == q][0]
            qlab = int(labels[ids == q][0])
            s = np.asarray(round_half_away(nrm @ qv, 6))
            keep = ids != q
            order = np.lexsort((ids[keep], -s[keep]))
            ranked_ids = ids[keep][order]
            ranked_lab = labels[keep][order]
            hit_pos = np.flatnonzero(ranked_lab == qlab)[:FANN_K]
            depth = int(hit_pos[-1] + 1)
            g = got[got["qid"] == q]
            assert list(g["vec_id"]) == list(ranked_ids[hit_pos])
            assert (g["label"] == qlab).all()
            assert (g["overfetch_depth"] == depth).all()

    def test_overfetch_at_least_k(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import FANN_K, q_filtered_ann

        got = q_filtered_ann(sf_tiny)
        assert (got["overfetch_depth"] >= FANN_K).all()
        assert (got["overfetch_factor"] >= 1.0).all()


