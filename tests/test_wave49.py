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


class TestBhFdr:
    def test_matches_scipy_free_recompute(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BH_ALPHA,
            _norm_sf_2sided,
            q_bh_fdr,
        )

        cust = pd.read_parquet(
            f"{sf_tiny}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
        )
        nation = pd.read_parquet(
            f"{sf_tiny}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        cents = np.round(cust["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        df = pd.DataFrame({"nk": cust["c_nationkey"], "c": cents})
        per = df.groupby("nk").agg(n=("c", "size"), s=("c", "sum")).reset_index()
        ss = df.assign(c2=df["c"] * df["c"]).groupby("nk")["c2"].sum().to_numpy()
        N = per["n"].sum()
        mean_all = per["s"].sum() / N
        var_all = ss.sum() / N - mean_all * mean_all
        z = (per["s"] / per["n"] - mean_all) / np.sqrt(var_all / per["n"].to_numpy())
        p = _norm_sf_2sided(z.to_numpy())
        got = q_bh_fdr(sf_tiny).set_index("n_name")
        names = nation.set_index("n_nationkey")["n_name"]
        for nk, zz, pp in zip(per["nk"], z, p):
            r = got.loc[names.loc[nk]]
            assert abs(r["z_stat"] - zz) < 1e-5
            assert abs(r["p_value"] - pp) < 1e-5
        # BH step-up recomputed independently
        m = len(p)
        order = np.argsort(p, kind="mergesort")
        passing = p[order] <= np.arange(1, m + 1) * BH_ALPHA / m
        k = int(np.max(np.flatnonzero(passing)) + 1) if passing.any() else 0
        assert int(got["rejected"].sum()) == k

    def test_erf_poly_accuracy(self):
        from searchengine_ray.pipelines.queries import _norm_sf_2sided

        # A&S 7.1.26 is accurate to ~1.5e-7; check against math.erfc
        import math

        for z in (0.0, 0.5, 1.0, 1.96, 2.5758, 4.0):
            want = 2.0 * 0.5 * math.erfc(abs(z) / math.sqrt(2.0))
            assert abs(_norm_sf_2sided(np.array([z]))[0] - want) < 5e-7
