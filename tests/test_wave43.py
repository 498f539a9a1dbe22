"""Brute-force identity tests for the DiD and PR-curve wave
(registry 279-280)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _milli(v):
    r = np.round(np.asarray(v, np.float64), 3) * 1e3
    return (np.floor(np.abs(r) + 0.5) * np.sign(r)).astype(np.int64)


class TestDiffInDiff:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import CUPED_SPLIT_DAY, q_diff_in_diff

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        p = ev[ev["event_type"] == "purchase"].copy()
        p["variant"] = (p["user_id"] % 2).astype(int)
        p["post"] = (
            p["ts"].astype("int64") // 86_400_000_000 >= CUPED_SPLIT_DAY
        ).astype(int)
        p["m"] = _milli(p["value"])
        cells = p.groupby(["variant", "post"])["m"].agg(["sum", "size"])
        mean = {k: r["sum"] / r["size"] for k, r in cells.iterrows()}
        did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
        got = q_diff_in_diff(sf_tiny)
        assert len(got) == 4
        for r in got.itertuples():
            assert int(r.n) == int(cells.loc[(r.variant, r.post), "size"])
            assert abs(r.mean_milli - mean[(r.variant, r.post)]) < 1e-5
        assert abs(got["did_milli"].iloc[0] - did) < 1e-5

    def test_did_is_cell_mean_combination(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_diff_in_diff

        got = q_diff_in_diff(sf_tiny).set_index(["variant", "post"])
        m = got["mean_milli"]
        did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
        assert abs(got["did_milli"].iloc[0] - did) < 2e-6


class TestPrCurve:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import PR_THRESHOLDS, q_pr_curve

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["n_chars", "lang"])
        v = docs["n_chars"].to_numpy(np.int64)
        y = (docs["lang"] == "en").to_numpy()
        P = int(y.sum())
        got = q_pr_curve(sf_tiny).set_index("threshold")
        for t in PR_THRESHOLDS:
            pred = v >= t
            tp = int((pred & y).sum())
            assert int(got.loc[t, "tp"]) == tp
            assert int(got.loc[t, "predicted_pos"]) == int(pred.sum())
            if pred.sum():
                assert abs(got.loc[t, "precision"] - tp / pred.sum()) < 1e-6
            assert abs(got.loc[t, "recall"] - tp / P) < 1e-6
        # recall must be non-increasing in the threshold
        assert (np.diff(got["recall"].to_numpy()) <= 1e-12).all()
