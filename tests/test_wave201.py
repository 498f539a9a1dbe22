"""Wave 201: Good-Turing smoothing + Smith-Waterman — vs direct
recomputation and alignment properties."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd


class TestGoodTuring:
    def test_matches_direct_fit(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import _engine, q_good_turing

        eng = _engine(sf_tiny, "punct")
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        cf = collections.Counter()
        for t in docs["text"]:
            cf.update(eng.analyze(t))
        spec = collections.Counter(cf.values())
        ranks = sorted(spec)
        N = sum(r * f for r, f in spec.items())
        Z, lx = [], []
        for i, rr in enumerate(ranks):
            q = ranks[i - 1] if i > 0 else 0
            t = ranks[i + 1] if i + 1 < len(ranks) else 2 * rr - q
            Z.append(2 * spec[rr] / (t - q))
            lx.append(math.log(rr))
        ly = [math.log(z) for z in Z]
        m = len(ranks)
        sx, sy = sum(lx), sum(ly)
        sxx = sum(x * x for x in lx)
        sxy = sum(x * y for x, y in zip(lx, ly))
        b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
        a = (sy - b * sx) / m
        got = q_good_turing(sf_tiny)
        assert abs(got["b_micro"].iloc[0] / 1e6 - b) < 1e-5
        assert abs(got["a_micro"].iloc[0] / 1e6 - a) < 1e-5
        for r in got.itertuples():
            want = (r.r + 1) * math.exp(a + b * math.log(r.r + 1)) / math.exp(
                a + b * math.log(r.r)
            )
            assert abs(r.r_star_micro / 1e6 - want) < 1e-4
            assert r.f_r == spec.get(r.r, 0)
        assert got["p0_micro"].iloc[0] == int(
            np.rint(round(spec.get(1, 0) / N, 6) * 1e6)
        )

    def test_smoothed_counts_positive_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_good_turing

        got = q_good_turing(sf_tiny)
        rs = got["r_star_micro"].to_numpy()
        assert (rs > 0).all()
        assert (np.diff(rs) > 0).all()  # r* increases with r under LGT


class TestSmithWaterman:
    def test_matches_direct_dp(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SW_GAP,
            SW_MATCH,
            SW_MISS,
            SW_PREFIX,
            SW_STRIDE,
            q_smith_waterman,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        txt = dict(zip(docs["doc_id"].astype(int), docs["text"]))
        got = q_smith_waterman(sf_tiny).set_index("doc_a")
        for d in got.index:
            a = txt[d][:SW_PREFIX]
            b = txt[d + 1][:SW_PREFIX]
            H = np.zeros((len(a) + 1, len(b) + 1), np.int64)
            best = 0
            for i in range(1, len(a) + 1):
                for j in range(1, len(b) + 1):
                    sub = H[i - 1][j - 1] + (
                        SW_MATCH if a[i - 1] == b[j - 1] else SW_MISS
                    )
                    H[i][j] = max(0, sub, H[i - 1][j] + SW_GAP, H[i][j - 1] + SW_GAP)
                    best = max(best, H[i][j])
            assert got.loc[d, "sw_score"] == best, d

    def test_local_alignment_properties(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SW_MATCH, q_smith_waterman

        got = q_smith_waterman(sf_tiny)
        assert (got["sw_score"] >= 0).all()
        assert (got["sw_score"] <= got["ceiling"]).all()
        # identical strings hit the ceiling
        a = "the quick brown fox"
        H = np.zeros((len(a) + 1, len(a) + 1), np.int64)
        best = 0
        for i in range(1, len(a) + 1):
            for j in range(1, len(a) + 1):
                sub = H[i - 1][j - 1] + (SW_MATCH if a[i - 1] == a[j - 1] else -1)
                H[i][j] = max(0, sub, H[i - 1][j] - 1, H[i][j - 1] - 1)
                best = max(best, H[i][j])
        assert best == SW_MATCH * len(a)
