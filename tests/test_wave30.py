"""Brute-force identity tests for the DBSCAN / MMR / Kendall-tau /
forecast-MASE wave (registry 245-248)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _emb_matrix(sf: str):
    t = pd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(np.int64)
    X = np.stack([np.asarray(v, np.float64) for v in t["embedding"]])
    order = np.argsort(ids)
    return ids[order], X[order]




class TestMmr:
    def test_matches_greedy_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            MMR_K,
            MMR_LAMBDA,
            MMR_POOL,
            q_mmr_diversify,
        )

        ids, X = _emb_matrix(sf_tiny)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        q = Xn[ids == 0][0]
        rel_all = np.round(Xn @ q, 6)
        order = np.lexsort((ids, -rel_all))[:MMR_POOL]
        pool_ids = ids[order]
        rel = rel_all[order]
        sims = np.round(Xn[order] @ Xn[order].T, 6)
        chosen = []
        expect = []
        avail = np.ones(MMR_POOL, bool)
        for rank in range(1, MMR_K + 1):
            pen = sims[:, chosen].max(axis=1) if chosen else np.zeros(MMR_POOL)
            score = MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * pen
            score[~avail] = -np.inf
            cands = np.flatnonzero(score == score.max())
            best = min(cands, key=lambda i: pool_ids[i])
            expect.append((rank, int(pool_ids[best]), round(float(score[best]), 6)))
            chosen.append(best)
            avail[best] = False
        got = q_mmr_diversify(sf_tiny)
        assert [(int(r.rank), int(r.vec_id)) for r in got.itertuples()] == [
            (a, b) for a, b, _ in expect
        ]
        np.testing.assert_allclose(
            got["mmr"].to_numpy(), [s for *_, s in expect], atol=1e-6
        )
        # diversity property: MMR must not just repeat the cosine top-k
        assert len(set(got["vec_id"])) == MMR_K




