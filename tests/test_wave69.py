"""Brute-force identity tests for the Kneser-Ney / merge-policy wave
(registry 335-336)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


def _round_half_away(x: float, nd: int = 6) -> float:
    p = 10.0**nd
    return math.copysign(math.floor(abs(x) * p + 0.5) / p, x)


class TestKnBigramPpl:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            KN_DISCOUNT,
            q_kn_bigram_ppl,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source", "text"]
        )
        bigrams: list[tuple[str, str, str]] = []  # (source, t1, t2)
        for src, text in zip(docs["source"], docs["text"]):
            ts = _raw_tokens(text)
            for a, b in zip(ts, ts[1:]):
                bigrams.append((src, a, b))
        cnt: dict[tuple[str, str], int] = {}
        for _, a, b in bigrams:
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
        c1: dict[str, int] = {}
        fw: dict[str, int] = {}
        bw: dict[str, int] = {}
        for (a, b), n in cnt.items():
            c1[a] = c1.get(a, 0) + n
            fw[a] = fw.get(a, 0) + 1
            bw[b] = bw.get(b, 0) + 1
        T = float(len(cnt))
        micro: dict[tuple[str, str], int] = {}
        for (a, b), n in cnt.items():
            p = max(n - KN_DISCOUNT, 0.0) / c1[a] + KN_DISCOUNT * fw[a] / c1[
                a
            ] * (bw[b] / T)
            micro[(a, b)] = int(_round_half_away(math.log2(p) * 1e6, 0))
        sums: dict[str, int] = {}
        ns: dict[str, int] = {}
        for src, a, b in bigrams:
            sums[src] = sums.get(src, 0) + micro[(a, b)]
            ns[src] = ns.get(src, 0) + 1
        got = q_kn_bigram_ppl(sf_tiny)
        assert got["source"].tolist() == sorted(sums)
        for _, row in got.iterrows():
            s = row["source"]
            assert row["n_bigrams"] == ns[s]
            assert row["cross_entropy"] == pytest.approx(
                -(sums[s] / 1e6) / ns[s], abs=5.1e-7
            )

    def test_entropy_positive(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_kn_bigram_ppl

        got = q_kn_bigram_ppl(sf_tiny)
        # probabilities < 1 on any non-degenerate corpus => bits > 0
        assert (got["cross_entropy"] > 0).all()
        assert got["n_bigrams"].sum() > 0


class TestMergePolicySim:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            FLUSH_DOCS,
            MERGE_FANOUT,
            q_merge_policy_sim,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        n = docs["text"].map(lambda t: len(_raw_tokens(t))).to_numpy(np.int64)
        sizes = [
            int(n[i : i + FLUSH_DOCS].sum()) for i in range(0, len(n), FLUSH_DOCS)
        ]
        segs: list[int] = []
        written = merges = 0
        for sz in sizes:
            segs.append(sz)
            written += sz
            if len(segs) == MERGE_FANOUT:
                written += sum(segs)
                merges += 1
                segs = [
                    segs[i] + segs[i + 1] for i in range(0, MERGE_FANOUT, 2)
                ]
        got = q_merge_policy_sim(sf_tiny).iloc[0]
        assert got["n_docs"] == len(docs)
        assert got["n_flushes"] == len(sizes)
        assert got["n_merges"] == merges
        assert got["total_tokens"] == int(n.sum())
        assert got["total_written"] == written
        assert got["final_segments"] == len(segs)
        assert got["final_max_seg"] == max(segs)
        assert got["write_amp"] == pytest.approx(
            written / n.sum(), abs=5.1e-7
        )

    def test_amplification_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_merge_policy_sim

        got = q_merge_policy_sim(sf_tiny).iloc[0]
        # every flush writes once; merges only add
        assert got["write_amp"] >= 1.0
        assert got["total_written"] >= got["total_tokens"]
        assert 0 < got["final_segments"] < 8
