"""Brute-force identity tests for the sequence-packing / BH-FDR wave
(registry 293-294)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestDocPacking:
    def test_matches_per_source_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import PACK_CAP, q_doc_packing

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source", "text"]
        ).sort_values(["source", "doc_id"])
        got = q_doc_packing(sf_tiny).set_index("source")
        for src, g in docs.groupby("source"):
            tks = (g["text"].str.count(" ") + 1).to_numpy(np.int64)
            fill = bins = over = 0
            for t in tks:
                t = int(t)
                if t > PACK_CAP:
                    bins += (1 if fill > 0 else 0) + 1
                    fill = 0
                    over += 1
                elif fill + t <= PACK_CAP:
                    fill += t
                else:
                    bins += 1
                    fill = t
            nb = bins + (1 if fill > 0 else 0)
            r = got.loc[src]
            assert int(r["n_docs"]) == len(tks)
            assert int(r["total_tokens"]) == int(tks.sum())
            assert int(r["n_bins"]) == nb
            assert int(r["n_oversize"]) == over
            assert abs(r["util"] - tks.sum() / (nb * PACK_CAP)) < 1e-5

    def test_packing_invariants(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import PACK_CAP, q_doc_packing

        got = q_doc_packing(sf_tiny)
        # every bin holds at least one doc, so bins <= docs; utilization
        # can exceed 1 only via oversize singleton bins
        assert (got["n_bins"] <= got["n_docs"]).all()
        assert (got["n_bins"] >= 1).all()
        no_over = got[got["n_oversize"] == 0]
        assert (no_over["total_tokens"] <= no_over["n_bins"] * PACK_CAP).all()


