"""Brute-force identity tests for the varint-format/cardinality wave
(registry 321-322)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestVarintStreamRoundtrip:
    def test_digest_matches_source(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_varint_stream_roundtrip

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["event_id", "value"])
        got = q_varint_stream_roundtrip(sf_tiny)
        assert got["n"].iloc[0] == len(ev)
        assert got["id_sum"].iloc[0] == int(ev["event_id"].sum())
        want_milli = int((ev["value"].round(3) * 1e3).round().astype(np.int64).sum())
        assert got["milli_sum"].iloc[0] == want_milli

    def test_codec_roundtrip_direct(self):
        from searchengine_ray.codec import varbyte as vb

        vals = np.sort(np.array([0, 1, 5, 5, 300, 2**40], np.int64))
        assert (vb.decode(vb.encode(vals), len(vals)) == vals).all()


class TestJoinCardinality:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_join_cardinality

        got = q_join_cardinality(sf_tiny).set_index("join_name")
        for name, (ta, ka, tb, kb) in {
            "orders_customer": ("orders", "o_custkey", "customer", "c_custkey"),
            "lineitem_orders": ("lineitem", "l_orderkey", "orders", "o_orderkey"),
            "lineitem_part": ("lineitem", "l_partkey", "part", "p_partkey"),
        }.items():
            a = pd.read_parquet(f"{sf_tiny}/{ta}.parquet", columns=[ka])[ka]
            b = pd.read_parquet(f"{sf_tiny}/{tb}.parquet", columns=[kb])[kb]
            actual = int(
                a.value_counts()
                .to_frame("ca")
                .join(b.value_counts().to_frame("cb"), how="inner")
                .prod(axis=1)
                .sum()
            )
            est = len(a) * len(b) / max(a.nunique(), b.nunique())
            row = got.loc[name]
            assert row["rows_a"] == len(a)
            assert row["rows_b"] == len(b)
            assert row["distinct_a"] == a.nunique()
            assert row["distinct_b"] == b.nunique()
            assert row["actual"] == actual
            assert row["estimate"] == pytest.approx(est, rel=1e-9)
            assert row["q_error"] == pytest.approx(
                max(actual / est, est / actual), rel=1e-6
            )

    def test_qerror_at_least_one(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_join_cardinality

        got = q_join_cardinality(sf_tiny)
        assert (got["q_error"] >= 1.0 - 1e-9).all()
