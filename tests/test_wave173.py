"""Wave 173: Parquet split-block Bloom + ECOD outliers — vs direct
recomputation and the structures' guarantees."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestParquetBloom:
    def test_matches_direct_build(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PQB_NBLOCKS,
            PQB_SALTS,
            _md5_low64,
            q_parquet_bloom,
        )

        ids = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy(np.int64)
        filt = np.zeros((PQB_NBLOCKS, 8), np.int64)
        for d in ids:
            h = _md5_low64(str(int(d)))
            blk = ((h >> 32) * PQB_NBLOCKS) >> 32
            h32 = h & 0xFFFFFFFF
            for w, salt in enumerate(PQB_SALTS):
                bit = ((h32 * salt) & 0xFFFFFFFF) >> 27
                filt[blk, w] |= 1 << bit
        got = q_parquet_bloom(sf_tiny)
        want_bits = [
            sum(bin(int(filt[b, w])).count("1") for b in range(PQB_NBLOCKS))
            for w in range(8)
        ]
        assert list(got["set_bits"]) == want_bits
        # fp hits recomputed
        fp = 0
        for d in ids:
            h = _md5_low64(str(int(d + 1_000_000)))
            blk = ((h >> 32) * PQB_NBLOCKS) >> 32
            h32 = h & 0xFFFFFFFF
            ok = True
            for w, salt in enumerate(PQB_SALTS):
                bit = ((h32 * salt) & 0xFFFFFFFF) >> 27
                if not (filt[blk, w] >> bit) & 1:
                    ok = False
                    break
            fp += ok
        assert got["fp_hits"].iloc[0] == fp

    def test_no_false_negatives_by_construction(self, ray_session, sf_tiny):
        # q_parquet_bloom asserts membership internally; also sanity:
        from searchengine_ray.pipelines.queries import q_parquet_bloom

        got = q_parquet_bloom(sf_tiny)
        assert (got["set_bits"] <= got["n_keys"].iloc[0]).all()
        assert got["max_block_bits"].iloc[0] <= 256
        assert got["fp_hits"].iloc[0] <= got["fp_probes"].iloc[0]


class TestEcodOutliers:
    def test_matches_direct_ecdf(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            q_ecod_outliers,
            round_half_away,
        )

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
        M = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
        ids = emb["vec_id"].to_numpy(np.int64)
        n, dim = M.shape
        scores = np.zeros(n, np.int64)
        for d in range(dim):
            col = M[:, d]
            for i in range(n):
                le = int((col <= col[i]).sum())
                ge = int((col >= col[i]).sum())
                tail = min(le, ge)
                scores[i] += int(
                    np.rint(round_half_away(-math.log(tail / n), 6) * 1e6)
                )
        order = np.lexsort((ids, -scores))[:20]
        got = q_ecod_outliers(sf_tiny)
        assert list(got["vec_id"]) == [int(ids[i]) for i in order]
        assert list(got["score_micro"]) == [int(scores[i]) for i in order]

    def test_extreme_point_scores_high(self, ray_session, sf_tiny):
        """A vector at every dimension's max would take the maximal
        score; check monotonicity: top score ≥ median score."""
        from searchengine_ray.pipelines.queries import q_ecod_outliers

        got = q_ecod_outliers(sf_tiny)
        s = got["score_micro"].to_numpy()
        assert (np.diff(s) <= 0).all()
        assert (got["score_micro"] > 0).all()
