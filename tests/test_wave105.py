"""Brute-force identity tests for the ANN-tuning/storage-GC wave
(IVF recall curve + LFS cleaning, registry 407-408)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestIvfRecallCurve:
    def test_recall_monotone_and_converges(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            IVF_PROBES,
            q_ivf_recall_curve,
        )

        got = q_ivf_recall_curve(sf_tiny).sort_values("n_probe")
        assert got["n_probe"].tolist() == list(IVF_PROBES)
        r = got["recall_at_10"].to_numpy()
        # more probes can only help
        assert (np.diff(r) >= 0).all()
        assert (r <= 10).all()
        # probing half the cells finds most of the truth
        assert r[-1] >= 8

    def test_against_exact_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ivf_recall_curve

        emb = pd.read_parquet(
            f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        mat = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
        ids = emb["vec_id"].to_numpy(np.int64)
        q = mat[ids == 0][0]
        cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        exact = set(ids[np.lexsort((ids, -cos))[:10]].tolist())
        got = q_ivf_recall_curve(sf_tiny)
        # reported recall can never exceed the true overlap cardinality
        assert (got["recall_at_10"] <= len(exact)).all()
        assert (got["n_returned"] <= 10).all()


class TestLfsCleaning:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            LFS_SEG,
            LFS_TARGET_PCT,
            q_lfs_cleaning,
        )

        ids = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id"]
        )["doc_id"].astype(int)
        df = pd.DataFrame(
            {"seg": ids // LFS_SEG, "live": (ids % 7 != 0).astype(int)}
        )
        segs = df.groupby("seg").agg(n=("live", "size"), live=("live", "sum"))
        num = (segs["n"] - segs["live"]) * (segs.index + 1)
        den = segs["n"] + segs["live"]
        order = sorted(
            segs.index, key=lambda s: (-(num[s] / den[s]), s)
        )
        target = int(segs["n"].sum()) * LFS_TARGET_PCT // 100
        exp = []
        reclaimed = 0
        for rank, s in enumerate(order, 1):
            if reclaimed >= target:
                break
            rec = int(segs.loc[s, "n"] - segs.loc[s, "live"])
            reclaimed += rec
            exp.append(
                (rank, int(s), int(segs.loc[s, "n"]), int(segs.loc[s, "live"]), rec, reclaimed)
            )
        got = q_lfs_cleaning(sf_tiny)
        assert list(got.itertuples(index=False, name=None)) == exp

    def test_policy_shape(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_lfs_cleaning

        got = q_lfs_cleaning(sf_tiny).sort_values("rank")
        # cleaner prefers emptier (or older) segments: the copied-live
        # fraction should not trend upward strongly early on
        assert (np.diff(got["cum_reclaimed"].to_numpy()) > 0).all()
        assert (got["reclaimed"] + got["live"] == got["n_slots"]).all()
