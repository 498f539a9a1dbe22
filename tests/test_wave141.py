"""Brute-force identity tests for the sketch-calibration / ingest wave
(HLL error, truncation loss; registry 479-480)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


class TestHllError:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.functions.sketches import (
            HLL_P,
            _md5_lower64_ints,
        )
        from searchengine_ray.pipelines.queries import q_hll_error

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["text", "source"]
        )
        per: dict[str, set] = {}
        for _, r in docs.iterrows():
            per.setdefault(r["source"], set()).update(
                t
                for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if t and t not in STOP_WORDS
            )
        got = q_hll_error(sf_tiny).set_index("source")
        m = 1 << HLL_P
        for s, terms in per.items():
            h = _md5_lower64_ints(np.asarray(sorted(terms), dtype=object))
            reg = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
            w = h & np.uint64((1 << (64 - HLL_P)) - 1)
            _, bl = np.frexp(w.astype(np.float64))
            rho_v = (64 - HLL_P + 1) - bl.astype(np.int64)
            rho = np.zeros(m, np.int64)
            np.maximum.at(rho, reg, rho_v)
            alpha = 0.7213 / (1.0 + 1.079 / m)
            e = alpha * m * m / np.sum(np.power(2.0, -rho.astype(np.float64)))
            zeros = int((rho == 0).sum())
            if e <= 2.5 * m and zeros:
                e = m * np.log(m / zeros)
            row = got.loc[s]
            assert row["exact"] == len(terms)
            assert abs(row["estimate"] - e) < 1e-4
            assert abs(row["rel_err"] - (e - len(terms)) / len(terms)) < 1e-6

    def test_error_within_bound(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_hll_error

        got = q_hll_error(sf_tiny)
        # p=12 HLL: ~1.04/sqrt(4096) = 1.6% typical; allow generous 10%
        assert (got["rel_err"].abs() < 0.10).all()


class TestTruncationLoss:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import TRUNC_CUTS, q_truncation_loss

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])

        def ntok(t):
            return len(
                [w for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split() if w]
            )

        full = docs["text"].map(ntok)
        got = q_truncation_loss(sf_tiny)
        for c, (_, r) in zip(TRUNC_CUTS, got.iterrows()):
            kept = docs["text"].map(lambda t: ntok((t or "")[:c]))
            assert (r["cut_chars"], r["docs"]) == (c, len(docs))
            assert r["docs_affected"] == int((kept < full).sum())
            assert r["tokens_full"] == int(full.sum())
            assert r["tokens_kept"] == int(kept.sum())
            assert abs(r["loss_share"] - (1 - kept.sum() / full.sum())) < 1e-6

    def test_loss_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_truncation_loss

        got = q_truncation_loss(sf_tiny)
        # a bigger budget never loses more
        assert got["tokens_kept"].is_monotonic_increasing
        assert got["loss_share"].is_monotonic_decreasing
