"""Brute-force identity tests for the speculative/coloring wave
(hedged requests + graph coloring, registry 379-380)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestHedgedRequests:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_hedged_requests

        v = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["value"])[
            "value"
        ].to_numpy(np.float64)
        deci = (np.sign(v) * np.floor(np.abs(v * 10.0) + 0.5)).astype(np.int64)
        s = np.sort(deci)
        n = len(s)

        def order_stat(q):
            return int(s[min(n, math.ceil(n * q)) - 1])

        d = order_stat(0.95)
        # exact survival over breakpoints
        bps = np.unique(np.concatenate([s, s + d]))
        cgt = n - np.searchsorted(s, bps, side="right")
        cgt_shift = np.where(
            bps < d, n, n - np.searchsorted(s, bps - d, side="right")
        )
        s_num = cgt * cgt_shift
        p50h = int(bps[np.argmax(s_num * 2 <= n * n)])
        p99h = int(bps[np.argmax(s_num * 100 <= n * n)])
        got = q_hedged_requests(sf_tiny).iloc[0]
        assert got["d_deci"] == d
        assert got["p50_single"] == order_stat(0.5)
        assert got["p99_single"] == order_stat(0.99)
        assert got["p50_hedged"] == p50h
        assert got["p99_hedged"] == p99h
        rate = (n - np.searchsorted(s, d, side="right")) / n
        assert abs(got["hedge_rate_micro"] - round(rate * 1e6)) <= 1

    def test_hedging_cuts_the_tail(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_hedged_requests

        got = q_hedged_requests(sf_tiny).iloc[0]
        # hedging can only help the tail and never the median much
        assert got["p99_hedged"] <= got["p99_single"]
        assert got["p50_hedged"] <= got["p50_single"]
        # extra work is bounded by the hedge trigger probability ~5%
        assert got["hedge_rate_micro"] <= 70_000


class TestGraphColoring:
    @staticmethod
    def _coloring(sf):
        docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        adj: dict[str, set[str]] = {}
        for text in docs["text"]:
            ts = _raw_tokens(text)
            for a, b in zip(ts, ts[1:]):
                if a != b:
                    adj.setdefault(a, set()).add(b)
                    adj.setdefault(b, set()).add(a)
        order = sorted(adj, key=lambda t: (-len(adj[t]), t))
        color: dict[str, int] = {}
        for v in order:
            used = {color[u] for u in adj[v] if u in color}
            c = 1
            while c in used:
                c += 1
            color[v] = c
        return adj, color

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_graph_coloring

        adj, color = self._coloring(sf_tiny)
        exp = (
            pd.DataFrame({"t": list(color), "c": list(color.values())})
            .groupby("c")
            .agg(n=("t", "size"), f=("t", "min"))
        )
        got = q_graph_coloring(sf_tiny)
        assert got["color"].tolist() == sorted(exp.index)
        for _, r in got.iterrows():
            assert r["n_terms"] == exp.loc[r["color"], "n"]
            assert r["first_term"] == exp.loc[r["color"], "f"]

    def test_proper_and_greedy_bound(self, ray_session, sf_tiny):
        adj, color = self._coloring(sf_tiny)
        # proper
        for v, ns in adj.items():
            for u in ns:
                assert color[v] != color[u]
        # greedy never exceeds max degree + 1
        maxdeg = max(len(ns) for ns in adj.values())
        assert max(color.values()) <= maxdeg + 1
