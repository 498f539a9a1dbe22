"""Brute-force identity tests for the partition-skew/Luhn wave
(registry 325-326)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pytest


class TestPartitionSkew:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import (
            SKEW_SHARDS,
            q_partition_skew,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        vocab = sorted({t for ts in _token_lists(docs["text"]) for t in ts})
        n = len(vocab)
        exp = n / SKEW_SHARDS

        def dist(vals):
            counts = np.bincount(vals, minlength=SKEW_SHARDS)
            chisq = float(((counts - exp) ** 2 / exp).sum())
            return counts.max(), counts.min(), counts.max() / exp, chisq

        h = np.array(
            [
                int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")
                for t in vocab
            ],
            np.uint64,
        )
        want = {
            "md5_low": dist((h % SKEW_SHARDS).astype(int)),
            "md5_high": dist(((h >> np.uint64(32)) % SKEW_SHARDS).astype(int)),
            "length_mod": dist([len(t) % SKEW_SHARDS for t in vocab]),
            "firstchar_mod": dist([ord(t[0]) % SKEW_SHARDS for t in vocab]),
        }
        got = q_partition_skew(sf_tiny).set_index("scheme")
        assert sorted(got.index) == sorted(want)
        for name, (mx, mn, imb, chi) in want.items():
            row = got.loc[name]
            assert row["n_keys"] == n
            assert row["max_load"] == mx
            assert row["min_load"] == mn
            assert row["imbalance"] == pytest.approx(imb, abs=1e-6)
            assert row["chisq"] == pytest.approx(chi, abs=1e-4)

    def test_md5_beats_structural_keys(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_partition_skew

        got = q_partition_skew(sf_tiny).set_index("scheme")
        # content hashing should be far more uniform than length keys
        assert got.loc["md5_low", "chisq"] < got.loc["length_mod", "chisq"]
        assert got.loc["md5_low", "imbalance"] < got.loc["length_mod", "imbalance"]


class TestLuhnSummary:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import EN_STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            LUHN_MIN_FREQ,
            q_luhn_summary,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "text"])
        sent_re = re.compile(r"[.!?]+")
        ws_re = re.compile(r"[ \t\n\x0b\f\r]+")
        acc: dict[str, list] = {}
        for src, text in zip(docs["source"], docs["text"]):
            text = (text or "").lower()
            tok_sents = []
            counts: dict[str, int] = {}
            for s in sent_re.split(text):
                ts = [
                    t
                    for t in ws_re.split(s.replace(",", " ").replace(";", " "))
                    if t
                ]
                if ts:
                    tok_sents.append(ts)
                    for t in ts:
                        counts[t] = counts.get(t, 0) + 1
            if not tok_sents:
                continue
            sig = {
                t
                for t, c in counts.items()
                if c >= LUHN_MIN_FREQ and t not in EN_STOP_WORDS
            }
            scores = [
                (sum(1 for t in ts if t in sig) ** 2 / len(ts), i)
                for i, ts in enumerate(tok_sents)
            ]
            best_score, best_idx = max(
                ((s, -i) for s, i in scores)
            )  # max score, then min idx
            a = acc.setdefault(src, [0, 0, 0.0])
            a[0] += 1
            a[1] += -best_idx
            a[2] += round(best_score * 1e6)
        got = q_luhn_summary(sf_tiny).set_index("source")
        for src, (nd, isum, ssum) in acc.items():
            row = got.loc[src]
            assert row["n_docs"] == nd
            assert row["avg_best_idx"] == pytest.approx(isum / nd, abs=1e-6)
            assert row["avg_score"] == pytest.approx(ssum / 1e6 / nd, abs=2e-6)

    def test_scores_nonnegative(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_luhn_summary

        got = q_luhn_summary(sf_tiny)
        assert (got["avg_score"] >= 0).all()
        assert (got["avg_best_idx"] >= 0).all()
