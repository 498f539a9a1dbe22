"""Brute-force identity tests for the XML / bloom-join / Z-order wave
(registry 260-262)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestXmlRoundtrip:
    def test_digest_matches_direct_scan(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_xml_roundtrip

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet")
        got = q_xml_roundtrip(sf_tiny).set_index("source")
        for src, g in docs.groupby("source"):
            assert int(got.loc[src, "n"]) == len(g)
            assert int(got.loc[src, "id_sum"]) == int(g["doc_id"].sum())
            assert int(got.loc[src, "chars_sum"]) == int(g["n_chars"].sum())
            assert int(got.loc[src, "text_len_sum"]) == int(g["text"].str.len().sum())


class TestBloomJoin:
    def test_equals_plain_join(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bloom_join

        c = pd.read_parquet(f"{sf_tiny}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
        o = pd.read_parquet(f"{sf_tiny}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        keys = set(c.loc[c["c_mktsegment"] == "BUILDING", "c_custkey"].astype(int))
        m = o[o["o_custkey"].isin(keys)]
        p = np.round(m["o_totalprice"].to_numpy(np.float64), 2)
        cents = int((np.floor(np.abs(p * 100) + 0.5) * np.sign(p * 100)).sum())
        got = q_bloom_join(sf_tiny)
        assert int(got["n_orders"].iloc[0]) == len(m)
        assert int(got["cents"].iloc[0]) == cents
        # no false negatives: everything that joins must pass the bloom
        assert int(got["bloom_pass"].iloc[0]) >= len(m)

    def test_bloom_actually_prunes(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bloom_join

        o = pd.read_parquet(f"{sf_tiny}/orders.parquet", columns=["o_custkey"])
        got = q_bloom_join(sf_tiny)
        # the prefilter must drop a meaningful share of the fact side
        assert int(got["bloom_pass"].iloc[0]) < len(o)


class TestZorderLayout:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import ZORDER_PARTS, q_zorder_layout

        o = pd.read_parquet(f"{sf_tiny}/orders.parquet", columns=["o_custkey", "o_orderdate"])
        x = (o["o_custkey"].to_numpy(np.int64) % 256).astype(np.int64)
        day = o["o_orderdate"].astype("int64").to_numpy() // 86_400_000_000
        y = ((day - 9131) * 256 // (11535 - 9131 + 1)).astype(np.int64)
        z = np.zeros(len(x), np.int64)
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        pid = z * ZORDER_PARTS // 65536
        got = q_zorder_layout(sf_tiny)
        for r in got.itertuples():
            m = pid == r.pid
            assert int(r.n_rows) == int(m.sum())
            assert (int(r.x_min), int(r.x_max)) == (int(x[m].min()), int(x[m].max()))
            assert (int(r.y_min), int(r.y_max)) == (int(y[m].min()), int(y[m].max()))

    def test_zorder_boxes_are_local_on_both_dims(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_zorder_layout

        got = q_zorder_layout(sf_tiny)
        # every curve slice must bound BOTH dimensions strictly tighter
        # than the full domain on average -- the pruning property
        xspan = (got["x_max"] - got["x_min"]).mean()
        yspan = (got["y_max"] - got["y_min"]).mean()
        assert xspan < 224 and yspan < 224
