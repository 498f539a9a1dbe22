"""Brute-force identity tests for the sampling/index-layout wave
(Vose alias method + B+-tree bulk load, registry 353-354)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestAliasMethod:
    def test_exactness_certificate(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_alias_method

        got = q_alias_method(sf_tiny)
        # the defining property of a correct alias table: per-bucket
        # reconstructed mass equals scaled weight exactly
        assert (got["recon"] == got["w_scaled"]).all()
        # total mass: n cells of height W
        W = got["w"].sum()
        n = len(got)
        assert got["prob_num"].sum() + (W * n - got["prob_num"]).sum() // 1 >= 0
        assert (got["prob_num"] >= 0).all()
        assert (got["prob_num"] <= W).all()

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            ALIAS_SENTINEL,
            q_alias_method,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["ts", "event_type"]
        )
        day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400 % 7
        key = ev["event_type"] + "_" + day.astype(str)
        w = key.value_counts().sort_index()
        names = w.index.tolist()
        wv = w.to_numpy(np.int64)
        n, W = len(wv), int(wv.sum())
        cur = (wv * n).astype(np.int64)
        prob = np.full(n, ALIAS_SENTINEL, np.int64)
        alias = np.arange(n)
        small = [i for i in range(n) if cur[i] < W]
        large = [i for i in range(n) if cur[i] >= W]
        while small and large:
            s = small.pop(0)
            l = large.pop(0)
            prob[s] = cur[s]
            alias[s] = l
            cur[l] = cur[l] + cur[s] - W
            (small if cur[l] < W else large).append(l)
        for i in small + large:
            prob[i] = W
            alias[i] = i
        got = q_alias_method(sf_tiny)
        assert got["bucket"].tolist() == names
        assert got["w"].tolist() == wv.tolist()
        assert got["prob_num"].tolist() == prob.tolist()
        assert got["alias_bucket"].tolist() == [names[a] for a in alias]

    def test_sampler_distribution_exact(self, ray_session, sf_tiny):
        """Enumerating every (cell, coin) outcome of the alias sampler
        reproduces the weights exactly — the whole point of the table."""
        from searchengine_ray.pipelines.queries import q_alias_method

        got = q_alias_method(sf_tiny)
        names = got["bucket"].tolist()
        idx = {b: i for i, b in enumerate(names)}
        W = got["w"].sum()
        mass = np.zeros(len(got), np.int64)
        for _, r in got.iterrows():
            mass[idx[r["bucket"]]] += r["prob_num"]
            mass[idx[r["alias_bucket"]]] += W - r["prob_num"]
        assert mass.tolist() == (got["w"] * len(got)).tolist()


class TestBtreeBulkload:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BTREE_FANOUT,
            BTREE_LEAF,
            q_btree_bulkload,
        )

        keys = np.sort(
            pd.read_parquet(f"{sf_tiny}/orders.parquet", columns=["o_orderkey"])[
                "o_orderkey"
            ].unique()
        )
        K = len(keys)
        exp = []
        n, stride, lvl, prev = (
            (K + BTREE_LEAF - 1) // BTREE_LEAF,
            BTREE_LEAF,
            0,
            K,
        )
        while True:
            cap = BTREE_LEAF if lvl == 0 else BTREE_FANOUT
            exp.append((lvl, n, prev - (n - 1) * cap, int(keys[(n - 1) * stride])))
            if n == 1:
                break
            prev = n
            n = (n + BTREE_FANOUT - 1) // BTREE_FANOUT
            stride *= BTREE_FANOUT
            lvl += 1
        got = q_btree_bulkload(sf_tiny)
        assert list(got.itertuples(index=False, name=None)) == exp

    def test_shape_invariants(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BTREE_FANOUT,
            q_btree_bulkload,
        )

        got = q_btree_bulkload(sf_tiny)
        assert got.iloc[-1]["n_nodes"] == 1  # single root
        n = got["n_nodes"].to_numpy()
        # each level shrinks by the fanout
        for a, b in zip(n, n[1:]):
            assert b == math.ceil(a / BTREE_FANOUT)
        assert (got["last_fill"] >= 1).all()
