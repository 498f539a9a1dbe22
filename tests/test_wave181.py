"""Wave 181: OPIC cash propagation + histogram join estimation — vs
direct replay and exact-size ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestOpicCash:
    def test_cash_conserved_and_matches_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            OPIC_ROUNDS,
            _doc_graph_edges,
            q_opic_cash,
            round_half_away,
        )

        edges, n = _doc_graph_edges(sf_tiny)
        keep = edges[:, 0] != edges[:, 1]
        packed = np.unique(edges[keep, 0] * (1 << 31) + edges[keep, 1])
        src = (packed >> 31).astype(np.int64)
        dst = (packed & ((1 << 31) - 1)).astype(np.int64)
        out_deg = np.bincount(src, minlength=n)
        C = np.ones(n)
        H = np.zeros(n)
        for _ in range(OPIC_ROUNDS):
            H = H + C
            dangling = float(C[out_deg == 0].sum())
            share = np.where(out_deg > 0, C / np.maximum(out_deg, 1), 0.0)
            C = np.bincount(dst, weights=share[src], minlength=n) + dangling / n
            # cash conservation: total cash stays n every round
            assert abs(C.sum() - n) < 1e-6
        imp = round_half_away(H + C, 6)
        order = np.lexsort((np.arange(n), -imp))[:20]
        got = q_opic_cash(sf_tiny)
        assert list(got["doc_id"]) == [int(x) for x in order]
        assert np.allclose(got["importance"], imp[order])

    def test_online_estimate_tracks_pagerank(self, ray_session, sf_small):
        from searchengine_ray.pipelines.queries import q_opic_cash

        got = q_opic_cash(sf_small)
        # the hub structure (ids 0..9) should be visible to both
        assert got["overlap_with_pagerank"].iloc[0] >= 8


class TestHistJoinEst:
    def test_truth_values_exact(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_hist_join_est

        li = pd.read_parquet(f"{sf_tiny}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
        got = q_hist_join_est(sf_tiny).set_index("join_name")
        assert got.loc["orders_lineitem_fk", "true_size"] == len(li)
        cnt = li["l_suppkey"].value_counts().to_numpy(np.int64)
        assert got.loc["lineitem_suppkey_self", "true_size"] == int(
            (cnt.astype(object) ** 2).sum()
        )

    def test_estimates_reasonable(self, ray_session, sf_tiny):
        """Equi-width histograms with per-bucket distincts should land
        within a modest q-error on these benign distributions."""
        from searchengine_ray.pipelines.queries import q_hist_join_est

        got = q_hist_join_est(sf_tiny)
        assert (got["q_error"] >= 1.0).all()
        assert (got["q_error"] < 3.0).all()
        assert (got["est"] > 0).all()

    def test_matches_direct_histogram_formula(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import HJ_BUCKETS, q_hist_join_est

        li = pd.read_parquet(f"{sf_tiny}/lineitem.parquet", columns=["l_suppkey"])
        sk = li["l_suppkey"].to_numpy(np.int64)
        lo, hi = int(sk.min()), int(sk.max())
        w = max((hi - lo + 1 + HJ_BUCKETS - 1) // HJ_BUCKETS, 1)
        bk = (sk - lo) // w
        est = 0
        for b in np.unique(bk):
            h = int((bk == b).sum())
            d = len(np.unique(sk[bk == b]))
            est += h * h // d
        got = q_hist_join_est(sf_tiny).set_index("join_name")
        assert got.loc["lineitem_suppkey_self", "est"] == est
