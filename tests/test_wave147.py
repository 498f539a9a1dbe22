"""Brute-force identity tests for the market-mechanism wave
(sequential Elo, GSP auction; registry 491-492)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestEloSources:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            ELO_BASE,
            ELO_K,
            q_elo_sources,
            q_quality_scores,
        )

        qual = q_quality_scores(sf_tiny)[["doc_id", "quality"]].sort_values("doc_id")
        src = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"]
        ).sort_values("doc_id")
        df = qual.merge(src, on="doc_id").reset_index(drop=True)
        R = {s: ELO_BASE for s in sorted(src["source"].unique())}
        played = {s: 0 for s in R}
        wins = {s: 0 for s in R}
        for t in range(len(df) // 2):
            a, b = df.iloc[2 * t], df.iloc[2 * t + 1]
            if a["source"] == b["source"]:
                continue
            win_a = (a["quality"], -a["doc_id"]) > (b["quality"], -b["doc_id"])
            ea = 1 / (1 + 10 ** ((R[b["source"]] - R[a["source"]]) / 400))
            s_ = 1.0 if win_a else 0.0
            R[a["source"]] += ELO_K * (s_ - ea)
            R[b["source"]] += ELO_K * ((1 - s_) - (1 - ea))
            played[a["source"]] += 1
            played[b["source"]] += 1
            wins[a["source"] if win_a else b["source"]] += 1
        got = q_elo_sources(sf_tiny).set_index("source")
        for s in R:
            row = got.loc[s]
            assert abs(row["rating"] - R[s]) < 1e-5
            assert (row["matches"], row["wins"]) == (played[s], wins[s])

    def test_zero_sum(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import ELO_BASE, q_elo_sources

        got = q_elo_sources(sf_tiny)
        # Elo is zero-sum: total rating mass is conserved
        assert abs(got["rating"].sum() - ELO_BASE * len(got)) < 1e-3
        assert (got["wins"] <= got["matches"]).all()


class TestGspAuction:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            GSP_CTR_NUM,
            GSP_POSITIONS,
            q_gsp_auction,
            q_quality_scores,
        )

        qual = q_quality_scores(sf_tiny)[["doc_id", "quality"]]
        src = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"]
        )
        bids = (
            qual.merge(src, on="doc_id")
            .groupby("source")["quality"]
            .mean()
            .mul(1000.0)
            .round(6)
        )
        order = sorted(bids.items(), key=lambda kv: (-kv[1], kv[0]))
        got = q_gsp_auction(sf_tiny)
        for p, (_, r) in enumerate(got.iterrows()):
            s, b = order[p]
            assert (r["position"], r["source"]) == (p + 1, s)
            assert abs(r["bid"] - b) < 1e-6
            assert abs(r["price"] - order[p + 1][1]) < 1e-6
            ctr = GSP_CTR_NUM[p] / 100
            assert abs(r["exp_revenue"] - order[p + 1][1] * ctr * 100) < 1e-4

    def test_gsp_properties(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_gsp_auction

        got = q_gsp_auction(sf_tiny)
        # second-price: nobody pays more than they bid
        assert (got["price"] <= got["bid"] + 1e-9).all()
        assert got["bid"].is_monotonic_decreasing
        assert got["exp_clicks"].is_monotonic_decreasing
