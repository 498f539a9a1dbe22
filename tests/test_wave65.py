"""Brute-force identity tests for the aHash/trigram wave
(registry 327-328)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestAhashNeardup:
    def test_matches_closed_form(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ahash_neardup

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        hashes = {}
        for d in docs["doc_id"]:
            p = np.array(
                [(7 * (k % 8) + 13 * (k // 8) + int(d)) % 256 for k in range(64)],
                np.int64,
            )
            h = "".join("1" if v * 64 >= p.sum() else "0" for v in p)
            hashes[h] = hashes.get(h, 0) + 1
        c = np.array(list(hashes.values()), np.int64)
        got = q_ahash_neardup(sf_tiny)
        assert got["n_images"].iloc[0] == len(docs)
        assert got["n_hashes"].iloc[0] == len(hashes)
        assert got["max_bucket"].iloc[0] == int(c.max())
        assert got["dup_pairs"].iloc[0] == int((c * (c - 1) // 2).sum())

    def test_decode_path_equals_closed_form(self):
        # the Ray side hashes DECODED pixels; prove decode == generator
        from searchengine_ray.functions.multimodal import (
            decode_bmp,
            synth_bmp_payload,
        )

        for d in [0, 7, 123, 4095]:
            px = decode_bmp(synth_bmp_payload(d))[:8, :8, 0].astype(np.int64)
            want = np.array(
                [[(7 * x + 13 * y + d) % 256 for x in range(8)] for y in range(8)],
                np.int64,
            )
            assert (px == want).all()


class TestSeq3Patterns:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SEQ3_TOPK, q_seq3_patterns

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        counts: dict[tuple, int] = {}
        for _, g in ev.groupby("user_id"):
            et = g.sort_values(["ts", "event_id"])["event_type"].tolist()
            for i in range(len(et) - 2):
                key = (et[i], et[i + 1], et[i + 2])
                counts[key] = counts.get(key, 0) + 1
        want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:SEQ3_TOPK]
        got = q_seq3_patterns(sf_tiny)
        assert len(got) == len(want)
        for (t, n), row in zip(want, got.itertuples()):
            assert (row.t1, row.t2, row.t3) == t
            assert row.n == n

    def test_total_triples_bound(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_seq3_patterns

        got = q_seq3_patterns(sf_tiny)
        assert (got["n"] > 0).all()
        assert (np.diff(got["n"].to_numpy()) <= 0).all()
