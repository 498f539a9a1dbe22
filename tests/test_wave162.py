"""Wave 162: EWMA control chart + averaged perceptron — vs direct
sequential recomputation."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd


class TestEwmaControl:
    def test_matches_sequential(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EWMA_L,
            EWMA_LAMBDA,
            q_ewma_control,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts"])
        days = (ev["ts"].astype("int64") // 86_400_000_000).value_counts().sort_index()
        x = days.to_numpy(np.int64)
        mu = x.sum() / len(x)
        sig = math.sqrt((x * x).sum() / len(x) - mu * mu)
        got = q_ewma_control(sf_tiny)
        assert list(got["day"]) == list(days.index)
        z = mu
        for t, r in enumerate(got.itertuples(), start=1):
            z = EWMA_LAMBDA * float(x[t - 1]) + (1 - EWMA_LAMBDA) * z
            hw = EWMA_L * sig * math.sqrt(
                EWMA_LAMBDA / (2 - EWMA_LAMBDA)
                * (1 - (1 - EWMA_LAMBDA) ** (2 * t))
            )
            assert abs(r.z - z) < 1e-5
            assert abs(r.ucl - (mu + hw)) < 1e-5
            assert abs(r.lcl - (mu - hw)) < 1e-5
            assert r.signal == (1 if (z > mu + hw or z < mu - hw) else 0)

    def test_limits_widen_then_plateau(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ewma_control

        got = q_ewma_control(sf_tiny)
        width = got["ucl"] - got["lcl"]
        assert (np.diff(width) >= -1e-9).all()  # monotone non-decreasing
        # asymptote: late widths nearly equal
        assert width.iloc[-1] - width.iloc[len(width) // 2] < 0.05 * width.iloc[-1]


class TestAvgPerceptron:
    def _feats(self, sf_dir):
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        out = []
        for r in docs.itertuples():
            toks = [
                w
                for w in re.split(r"[ \t\n\x0b\f\r]+", re.sub(r"[,.;?!]", " ", r.text.lower()))
                if w
            ]
            out.append(
                (int(r.doc_id), r.lang, len(toks), sum(1 for t in toks if t == "the"))
            )
        return out

    def test_matches_sequential_training(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import PERC_STRIDE, q_avg_perceptron

        feats = self._feats(sf_tiny)
        w = np.zeros(3, np.int64)
        cw = np.zeros(3, np.int64)
        nu = 0
        for did, lang, nt, nthe in sorted(feats):
            if did % PERC_STRIDE != 0:
                continue
            x = np.array([1, nt, nthe], np.int64)
            y = 1 if lang == "en" else -1
            if y * int(w @ x) <= 0:
                w = w + y * x
                nu += 1
            cw = cw + w
        got = q_avg_perceptron(sf_tiny)
        assert (got["w_bias"] == w[0]).all() and (got["w_nt"] == w[1]).all()
        assert (got["w_nthe"] == w[2]).all()
        assert (got["cw_bias"] == cw[0]).all() and (got["cw_nt"] == cw[1]).all()
        assert (got["cw_nthe"] == cw[2]).all()
        assert (got["n_updates"] == nu).all()
        # confusion counts
        want = {}
        for did, lang, nt, nthe in feats:
            pred = 1 if cw[0] + cw[1] * nt + cw[2] * nthe > 0 else 0
            n, pe, co = want.get(lang, (0, 0, 0))
            want[lang] = (n + 1, pe + pred, co + int(pred == (1 if lang == "en" else 0)))
        for r in got.itertuples():
            assert (r.n_docs, r.n_pred_en, r.n_correct) == want[r.lang], r.lang

    def test_beats_majority_baseline(self, ray_session, sf_small):
        """The trained classifier should beat always-predict-majority
        on overall accuracy (the 'the' feature separates English)."""
        from searchengine_ray.pipelines.queries import q_avg_perceptron

        got = q_avg_perceptron(sf_small)
        acc = got["n_correct"].sum() / got["n_docs"].sum()
        maj = max(
            got.loc[got["lang"] == "en", "n_docs"].sum(),
            got.loc[got["lang"] != "en", "n_docs"].sum(),
        ) / got["n_docs"].sum()
        assert acc >= maj
