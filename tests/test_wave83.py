"""Brute-force identity tests for the dictionary/scheduling wave
(trie stats + interval scheduling, registry 363-364)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestTrieStats:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_trie_stats

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        vocab: set[str] = set()
        for text in docs["text"]:
            ts = _raw_tokens(text)
            vocab.update(f"{a} {b}" for a, b in zip(ts, ts[1:]))
        nodes: dict[int, set] = {}
        terminal: dict[int, int] = {}
        for t in vocab:
            for d in range(1, len(t) + 1):
                nodes.setdefault(d, set()).add(t[:d])
            terminal[len(t)] = terminal.get(len(t), 0) + 1
        got = q_trie_stats(sf_tiny)
        assert got["depth"].tolist() == sorted(nodes)
        for _, r in got.iterrows():
            assert r["n_nodes"] == len(nodes[r["depth"]])
            assert r["n_terminal"] == terminal.get(r["depth"], 0)

    def test_trie_invariants(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_trie_stats

        got = q_trie_stats(sf_tiny)
        # depth-1 nodes = distinct first chars <= alphabet
        assert got.iloc[0]["n_nodes"] <= 26
        # node counts can't more than 26x between depths (fanout bound)
        n = got["n_nodes"].to_numpy()
        assert (n[1:] <= n[:-1] * 26).all()
        assert got["n_terminal"].sum() > 0


class TestIntervalScheduling:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SCHED_GAP_US,
            q_interval_scheduling,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["user_id", "event_id", "ts"]
        )
        ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
        got = q_interval_scheduling(sf_tiny)
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values(["t", "event_id"])
            t = g["t"].to_numpy(np.int64)
            brk = np.concatenate([[True], np.diff(t) > SCHED_GAP_US])
            sess = np.cumsum(brk)
            iv = (
                pd.DataFrame({"s": sess, "t": t})
                .groupby("s")["t"]
                .agg(["min", "max"])
                .sort_values(["max", "min"])
            )
            last, nsel = -1, 0
            for st, en in zip(iv["min"], iv["max"]):
                if st >= last:
                    nsel += 1
                    last = en
            row = got[got["user_id"] == uid].iloc[0]
            assert row["n_intervals"] == len(iv)
            assert row["n_selected"] == nsel

    def test_greedy_is_optimal_on_small_cases(self):
        """Earliest-end greedy equals brute-force max independent set
        of intervals."""
        from itertools import combinations

        rng = np.random.default_rng(3)
        for _ in range(30):
            k = int(rng.integers(2, 8))
            st = rng.integers(0, 50, k)
            en = st + rng.integers(1, 20, k)
            iv = sorted(zip(en, st))
            last, nsel = -1, 0
            for e, s in iv:
                if s >= last:
                    nsel += 1
                    last = e
            best = 0
            for r in range(k + 1):
                for c in combinations(range(k), r):
                    ok = True
                    sel = sorted((st[i], en[i]) for i in c)
                    for (s1, e1), (s2, e2) in zip(sel, sel[1:]):
                        if s2 < e1:
                            ok = False
                            break
                    if ok:
                        best = max(best, r)
            assert nsel == best

    def test_selection_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_interval_scheduling

        got = q_interval_scheduling(sf_tiny)
        assert (got["n_selected"] >= 1).all()
        assert (got["n_selected"] <= got["n_intervals"]).all()
