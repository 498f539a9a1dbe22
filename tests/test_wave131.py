"""Brute-force identity tests for the model-quality wave
(calibration ECE, weak-supervision label model; registry 459-460)."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd


def _feats(sf_dir: str):
    from searchengine_ray.analysis.stopwords import STOP_WORDS

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    )
    rows = []
    for _, r in docs.iterrows():
        toks = [
            t for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split() if t
        ]
        if not toks:
            continue
        stop = sum(t in STOP_WORDS for t in toks)
        rows.append(
            (
                int(r["doc_id"]),
                1.0 if r["lang"] == "en" else 0.0,
                stop / len(toks),
                np.log1p(r["n_chars"]),
                sum(len(t) for t in toks) / len(toks),
            )
        )
    return pd.DataFrame(rows, columns=["doc_id", "y", "share", "x2", "mlen"])


class TestCalibrationEce:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            ECE_BINS,
            q_calibration_ece,
            q_logreg_quality,
        )

        fit = q_logreg_quality(sf_tiny).iloc[-1]
        f = _feats(sf_tiny)
        p = 1.0 / (
            1.0 + np.exp(-(fit["b0"] + fit["b1"] * f["share"] + fit["b2"] * f["x2"]))
        )
        binid = np.minimum((p * ECE_BINS).astype(int), ECE_BINS - 1)
        g = pd.DataFrame({"bin": binid, "p": p, "y": f["y"]}).groupby("bin")
        got = q_calibration_ece(sf_tiny)
        N = len(f)
        ece = 0.0
        for b, gg in g:
            row = got[got["bin"] == b].iloc[0]
            assert row["n"] == len(gg)
            assert abs(row["confidence"] - gg["p"].mean()) < 1e-6
            assert abs(row["accuracy"] - gg["y"].mean()) < 1e-6
            ece += len(gg) / N * abs(gg["y"].mean() - gg["p"].mean())
        assert abs(got["ece"].iloc[0] - ece) < 1e-6

    def test_ece_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_calibration_ece

        got = q_calibration_ece(sf_tiny)
        assert ((got["ece"] >= 0) & (got["ece"] <= 1)).all()
        assert (got["gap"] >= 0).all()


class TestLabelModel:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import LM_DEV_MOD, q_label_model

        f = _feats(sf_tiny)
        f["l1"] = (f["share"] >= 0.05).astype(int)
        f["l2"] = (f["share"] >= 0.08).astype(int)
        f["l3"] = (f["mlen"] <= 5.5).astype(int)
        f["dev"] = f["doc_id"].apply(
            lambda d: int.from_bytes(
                hashlib.md5(str(d).encode()).digest()[8:], "little"
            )
            % LM_DEV_MOD
            == 0
        )
        dev, hold = f[f["dev"]], f[~f["dev"]]
        got = q_label_model(sf_tiny).set_index("name")
        ws = []
        for li in ("l1", "l2", "l3"):
            acc = (dev[li] == dev["y"]).mean()
            acc_c = min(max(acc, 0.05), 0.95)
            w = math.log(acc_c / (1 - acc_c))
            ws.append(w)
            assert abs(got.loc[li, "dev_acc"] - acc) < 1e-6
            assert abs(got.loc[li, "weight"] - w) < 1e-6
            assert abs(got.loc[li, "holdout_acc"] - (hold[li] == hold["y"]).mean()) < 1e-6
        s = sum(
            w * (2 * hold[li] - 1) for w, li in zip(ws, ("l1", "l2", "l3"))
        )
        wacc = ((s > 0).astype(int) == hold["y"]).mean()
        macc = (
            ((hold["l1"] + hold["l2"] + hold["l3"] >= 2).astype(int) == hold["y"])
        ).mean()
        assert abs(got.loc["weighted", "holdout_acc"] - wacc) < 1e-6
        assert abs(got.loc["majority", "holdout_acc"] - macc) < 1e-6

    def test_combiners_reasonable(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_label_model

        got = q_label_model(sf_tiny).set_index("name")
        base = max(got.loc[li, "holdout_acc"] for li in ("l1", "l2", "l3"))
        # combining noisy labelers shouldn't collapse far below the best
        assert got.loc["weighted", "holdout_acc"] >= base - 0.25
