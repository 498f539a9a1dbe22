"""Brute-force identity tests for the layout/partitioning wave
(Hilbert curve + radix histograms, registry 361-362)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


def _hilbert_ref(n: int, x: int, y: int) -> int:
    """Textbook scalar xy2d (Wikipedia formulation)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


class TestHilbertLayout:
    def test_hilbert_function_vs_textbook(self):
        from searchengine_ray.pipelines.queries import HILBERT_BITS, _hilbert_d

        G = 1 << HILBERT_BITS
        xs, ys = np.meshgrid(np.arange(G), np.arange(G))
        xs, ys = xs.ravel(), ys.ravel()
        got = _hilbert_d(xs, ys)
        for i in range(0, len(xs), 97):
            assert got[i] == _hilbert_ref(G, int(xs[i]), int(ys[i]))
        # bijection over the grid
        assert len(np.unique(got)) == G * G
        assert got.min() == 0 and got.max() == G * G - 1

    def test_hilbert_unit_steps(self):
        """Consecutive Hilbert indices are grid neighbours — the
        locality property Morton lacks."""
        from searchengine_ray.pipelines.queries import HILBERT_BITS, _hilbert_d

        G = 1 << HILBERT_BITS
        xs, ys = np.meshgrid(np.arange(G), np.arange(G))
        xs, ys = xs.ravel(), ys.ravel()
        d = _hilbert_d(xs, ys)
        order = np.argsort(d)
        dx = np.abs(np.diff(xs[order]))
        dy = np.abs(np.diff(ys[order]))
        assert ((dx + dy) == 1).all()

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            HILBERT_BITS,
            _hilbert_d,
            q_hilbert_layout,
        )

        G = 1 << HILBERT_BITS
        li = pd.read_parquet(
            f"{sf_tiny}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
        )
        cells = (
            pd.DataFrame(
                {"x": li["l_partkey"] % G, "y": li["l_suppkey"] % G}
            )
            .drop_duplicates()
            .reset_index(drop=True)
        )
        x = cells["x"].to_numpy(np.int64)
        y = cells["y"].to_numpy(np.int64)
        z = np.zeros(len(x), np.int64)
        for i in range(HILBERT_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        exp = {}
        for name, h in (
            ("hilbert", _hilbert_d(x, y)),
            ("morton", z),
            ("rowmajor", y * G + x),
        ):
            hs = np.sort(h)
            gaps = np.diff(hs)
            exp[name] = (len(hs), int((gaps == 1).sum()), gaps.mean())
        got = q_hilbert_layout(sf_tiny)
        for _, r in got.iterrows():
            n, adj, mg = exp[r["curve"]]
            assert (r["n_cells"], r["adjacent_pairs"]) == (n, adj)
            assert r["mean_gap"] == pytest.approx(mg, abs=5.1e-7)
        # Hilbert locality dominates morton and rowmajor on this grid
        g = got.set_index("curve")
        assert (
            g.loc["hilbert", "adjacent_pairs"]
            >= g.loc["morton", "adjacent_pairs"]
        )


class TestRadixHist:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            RADIX_PASSES,
            q_radix_hist,
        )

        keys = pd.read_parquet(
            f"{sf_tiny}/orders.parquet", columns=["o_orderkey"]
        )["o_orderkey"].to_numpy(np.int64)
        got = q_radix_hist(sf_tiny)
        for p in range(RADIX_PASSES):
            d = (keys >> (8 * p)) & 0xFF
            cnt = pd.Series(d).value_counts()
            pr = cnt.to_numpy() / len(keys)
            ent = -(pr * np.log2(pr)).sum()
            row = got[got["pass"] == p].iloc[0]
            assert row["n_used"] == len(cnt)
            assert row["max_bucket"] == int(cnt.max())
            assert row["entropy"] == pytest.approx(ent, abs=5.1e-7)

    def test_pass_structure(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_radix_hist

        got = q_radix_hist(sf_tiny)
        # low byte spreads well, high bytes collapse for small keys
        assert got.iloc[0]["entropy"] > got.iloc[-1]["entropy"]
        assert (got["entropy"] >= 0).all()
        assert (got["n_used"] <= 256).all()
