"""Brute-force identity tests for the external-sort/adaptive-index wave
(replacement selection + database cracking, registry 387-388)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


def _runs(stream: list[int], M: int) -> list[int]:
    active = sorted(stream[:M])
    pending: list[int] = []
    idx, last, cur = M, -1, 0
    runs: list[int] = []
    while active or pending:
        elig = [x for x in active if x >= last]
        if not elig:
            runs.append(cur)
            cur, last = 0, -1
            active = sorted(active + pending)
            pending = []
            continue
        out = min(elig)
        active.remove(out)
        cur += 1
        last = out
        if idx < len(stream):
            x = stream[idx]
            idx += 1
            (active if x >= last else pending).append(x)
    if cur:
        runs.append(cur)
    return runs


class TestReplacementSelection:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            RS_MEM,
            RS_STRIDE,
            q_replacement_selection,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        stream = [
            len(_raw_tokens(t))
            for d, t in zip(docs["doc_id"], docs["text"])
            if d % RS_STRIDE == 0
        ]
        got = q_replacement_selection(sf_tiny)
        assert got["run_len"].tolist() == _runs(stream, RS_MEM)
        assert got["run_len"].sum() == len(stream)

    def test_snowplow_effect(self):
        """On random input mean run length approaches 2M (Knuth)."""
        rng = np.random.default_rng(17)
        stream = rng.integers(0, 10**6, 4000).tolist()
        runs = _runs(stream, 25)
        mean = np.mean(runs[:-1]) if len(runs) > 1 else runs[0]
        assert 1.5 * 25 < mean < 2.6 * 25
        # sorted input gives ONE run (the best case)
        assert len(_runs(sorted(stream[:500]), 25)) == 1


class TestDbCracking:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CRACK_QUERIES,
            q_db_cracking,
        )

        p = pd.read_parquet(
            f"{sf_tiny}/orders.parquet", columns=["o_totalprice"]
        )["o_totalprice"].to_numpy(np.float64)
        cents = np.sort(
            (np.sign(p) * np.floor(np.abs(np.round(p, 2) * 100) + 0.5)).astype(
                np.int64
            )
        )
        gmin, gmax = int(cents[0]), int(cents[-1])
        span = gmax - gmin

        def cum_lt(x):
            return int(np.searchsorted(cents, x, side="left"))

        bounds = [gmin, gmax + 1]
        got = q_db_cracking(sf_tiny)
        for k in range(1, CRACK_QUERIES + 1):
            lo = gmin + (k * 7919) % span
            hi = min(gmax + 1, lo + span // 10)
            lb = max(b for b in bounds if b <= lo)
            ub = min(b for b in bounds if b > hi)
            row = got[got["query"] == k].iloc[0]
            assert (row["lo"], row["hi"]) == (lo, hi)
            assert row["n_pieces"] == len(bounds) - 1
            assert row["scan_cost"] == cum_lt(ub) - cum_lt(lb)
            assert row["n_matches"] == cum_lt(hi) - cum_lt(lo)
            for b in (lo, hi):
                if b not in bounds:
                    bounds.append(b)
            bounds.sort()

    def test_cost_decays(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_db_cracking

        got = q_db_cracking(sf_tiny).sort_values("query")
        # cracking converges: late queries scan far less slack than
        # the first (which scans the whole column)
        waste = got["scan_cost"] - got["n_matches"]
        assert waste.iloc[0] > waste.tail(5).mean()
        assert (got["scan_cost"] >= got["n_matches"]).all()
        assert (np.diff(got["n_pieces"].to_numpy()) >= 0).all()
