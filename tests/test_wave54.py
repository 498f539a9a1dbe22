"""Brute-force identity tests for the kNN/jackknife/winnowing wave
(registry 304-306)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest






def _winnow_doc(tokens: list[str], k: int, w: int):
    """Reference winnowing: (n_grams, n_windows, selected positions)."""
    if len(tokens) < k:
        return 0, 0, set()
    grams = ["\x1f".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    h = [
        int.from_bytes(hashlib.md5(g.encode()).digest()[8:], "little")
        for g in grams
    ]
    if len(h) < w:
        return len(h), 0, set()
    sel = set()
    for s in range(len(h) - w + 1):
        window = h[s : s + w]
        m = min(window)
        # rightmost occurrence of the min
        pos = s + max(j for j, x in enumerate(window) if x == m)
        sel.add(pos)
    return len(h), len(h) - w + 1, sel


class TestWinnowing:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import (
            WINNOW_K,
            WINNOW_W,
            q_winnowing_fingerprints,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "text"])
        acc: dict[str, list[int]] = {}
        for src, ts in zip(docs["source"], _token_lists(docs["text"])):
            ng, nw, sel = _winnow_doc(list(ts), WINNOW_K, WINNOW_W)
            a = acc.setdefault(src, [0, 0, 0, 0])
            a[1] += ng
            if nw:
                a[0] += 1
                a[2] += nw
                a[3] += len(sel)
        got = q_winnowing_fingerprints(sf_tiny).set_index("source")
        assert sorted(got.index) == sorted(acc)
        for src, (nd, ng, nw, nf) in acc.items():
            row = got.loc[src]
            assert row["n_docs"] == nd
            assert row["n_grams"] == ng
            assert row["n_windows"] == nw
            assert row["n_fp"] == nf
            assert row["density"] == pytest.approx(nf / nw, abs=1e-6)

    def test_density_near_guarantee(self, ray_session, sf_tiny):
        # winnowing's expected density is 2/(w+1); every window must
        # contain at least one selection so density is in (1/w, 1]
        from searchengine_ray.pipelines.queries import WINNOW_W, q_winnowing_fingerprints

        got = q_winnowing_fingerprints(sf_tiny)
        assert ((got["density"] > 1.0 / WINNOW_W) & (got["density"] <= 1.0)).all()
        assert (got["n_fp"] <= got["n_windows"]).all()
