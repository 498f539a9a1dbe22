"""Brute-force identity tests for the storage-layout wave
(front-coding + RLE/dict audits, registry 341-342)."""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pytest


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestFrontcodeAudit:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            FC_BLOCK,
            q_frontcode_audit,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        vocab: set[str] = set()
        for text in docs["text"]:
            ts = _raw_tokens(text)
            vocab.update(f"{a} {b}" for a, b in zip(ts, ts[1:]))
        terms = sorted(vocab)
        exp: dict[str, list[int]] = {}
        for i in range(0, len(terms), FC_BLOCK):
            blk = terms[i : i + FC_BLOCK]
            raw = sum(1 + len(t) for t in blk)
            fc = 1 + len(blk[0])
            for prev, cur in zip(blk, blk[1:]):
                fc += 2 + len(cur) - len(os.path.commonprefix([prev, cur]))
            e = exp.setdefault(blk[0][0], [0, 0, 0, 0])
            e[0] += 1
            e[1] += len(blk)
            e[2] += raw
            e[3] += fc
        got = q_frontcode_audit(sf_tiny)
        assert got["first_char"].tolist() == sorted(exp)
        for _, row in got.iterrows():
            nb, nt, raw, fc = exp[row["first_char"]]
            assert (
                row["n_blocks"],
                row["n_terms"],
                row["raw_bytes"],
                row["fc_bytes"],
            ) == (nb, nt, raw, fc)
            assert row["ratio"] == pytest.approx(raw / fc, abs=5.1e-7)

    def test_compresses(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_frontcode_audit

        got = q_frontcode_audit(sf_tiny)
        # bigrams sharing a first word guarantee savings overall
        assert got["fc_bytes"].sum() < got["raw_bytes"].sum()
        assert (got["fc_bytes"] > 0).all()


class TestRleDictAudit:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_rle_dict_audit

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"]
        ).sort_values("doc_id")
        src = docs["source"].to_numpy()
        starts = np.concatenate([[True], src[1:] != src[:-1]])
        runs = pd.Series(src[starts]).value_counts().to_dict()
        rows = pd.Series(src).value_counts().to_dict()
        got = q_rle_dict_audit(sf_tiny)
        assert got["source"].tolist() == sorted(rows)
        for _, r in got.iterrows():
            s = r["source"]
            assert r["n_rows"] == rows[s]
            assert r["n_runs"] == runs[s]
            assert r["rle_bytes"] == 3 * runs[s]
            assert r["plain_bytes"] == rows[s]
            assert r["avg_run_len"] == pytest.approx(
                rows[s] / runs[s], abs=5.1e-7
            )

    def test_run_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_rle_dict_audit

        got = q_rle_dict_audit(sf_tiny)
        assert (got["n_runs"] >= 1).all()
        assert (got["n_runs"] <= got["n_rows"]).all()
        # total runs across values == global run count
        assert got["n_runs"].sum() >= got["source"].nunique()
