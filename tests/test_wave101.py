"""Brute-force identity tests for the decoding-constraints wave
(nucleus cutoff + constrained paths, registry 399-400)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


def _bigrams(sf):
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    cnt: dict[tuple[str, str], int] = {}
    for text in docs["text"]:
        ts = _raw_tokens(text)
        for a, b in zip(ts, ts[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    return cnt


class TestNucleusCutoff:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BEAM_SEEDS,
            NUCLEUS_PCTS,
            q_nucleus_cutoff,
        )

        cnt = _bigrams(sf_tiny)
        got = q_nucleus_cutoff(sf_tiny)
        for seed in BEAM_SEEDS:
            succ = sorted(
                ((n, b) for (a, b), n in cnt.items() if a == seed),
                key=lambda x: (-x[0], x[1]),
            )
            total = sum(n for n, _ in succ)
            cum = np.cumsum([n for n, _ in succ])
            for p in NUCLEUS_PCTS:
                m = int(np.argmax(100 * cum >= p * total)) + 1
                row = got[(got["seed"] == seed) & (got["p_pct"] == p)].iloc[0]
                assert row["set_size"] == m
                assert row["total"] == total
                assert (
                    abs(row["mass_micro"] - round(cum[m - 1] / total * 1e6))
                    <= 1
                )

    def test_nucleus_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_nucleus_cutoff

        got = q_nucleus_cutoff(sf_tiny)
        for _, sub in got.groupby("seed"):
            s = sub.sort_values("p_pct")
            assert (np.diff(s["set_size"].to_numpy()) >= 0).all()
            # the nucleus actually truncates at p=50 on a spread head
            assert s.iloc[0]["set_size"] <= s.iloc[-1]["set_size"]
            assert (s["mass_micro"] * 100 >= s["p_pct"] * 1_000_000).all()


class TestConstrainedPaths:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BEAM_SEEDS,
            CP_ALLOWED,
            CP_MAX_K,
            q_constrained_paths,
        )

        cnt = _bigrams(sf_tiny)
        vocab = sorted({a for a, _ in cnt} | {b for _, b in cnt})
        vi = {t: i for i, t in enumerate(vocab)}
        V = len(vocab)
        A = np.zeros((V, V), np.int64)
        for a, b in cnt:
            if b[0] in CP_ALLOWED:
                A[vi[a], vi[b]] = 1
        got = q_constrained_paths(sf_tiny)
        for seed in BEAM_SEEDS:
            v = np.zeros(V, np.int64)
            v[vi[seed]] = 1
            for k in range(1, CP_MAX_K + 1):
                v = v @ A
                row = got[(got["seed"] == seed) & (got["k"] == k)].iloc[0]
                assert row["n_paths"] == int(v.sum())

    def test_path_growth(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_constrained_paths

        got = q_constrained_paths(sf_tiny)
        for _, sub in got.groupby("seed"):
            p = sub.sort_values("k")["n_paths"].to_numpy()
            # lattice fan-out grows the path count each hop
            assert (np.diff(p) >= 0).all()
            assert p[0] >= 1
