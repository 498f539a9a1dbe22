"""Brute-force identity tests for the assignment/top-k wave
(bitmask assignment DP + Fagin TA, registry 385-386)."""

from __future__ import annotations

import math
import re
from itertools import permutations

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


def _round_half_away(x: float, nd: int = 6) -> float:
    p = 10.0**nd
    return math.copysign(math.floor(abs(x) * p + 0.5) / p, x)


class TestAssignmentDp:
    def test_optimum_vs_permutations(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            ASSIGN_MOD,
            ASSIGN_N,
            q_assignment_dp,
        )

        sup = (
            pd.read_parquet(
                f"{sf_tiny}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
            )
            .sort_values("s_suppkey")
            .head(ASSIGN_N)
            .reset_index(drop=True)
        )
        n = len(sup)
        cents = (
            np.sign(sup["s_acctbal"].to_numpy())
            * np.floor(np.abs(np.round(sup["s_acctbal"].to_numpy(), 2) * 100) + 0.5)
        ).astype(np.int64)
        cost = (cents[:, None] + 137 * np.arange(n)[None, :]) % ASSIGN_MOD
        best = min(
            sum(int(cost[i, p[i]]) for i in range(n))
            for p in permutations(range(n))
        )
        got = q_assignment_dp(sf_tiny)
        head = got[got["mask"] == -1].iloc[0]
        assert head["dp_value"] == best
        assert head["greedy_cost"] >= best
        assert head["gap"] == head["greedy_cost"] - best

    def test_sampled_masks(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_assignment_dp

        got = q_assignment_dp(sf_tiny)
        rows = got[got["mask"] >= 0]
        # dp[0] exists and equals 0; unreachable masks encoded -1
        assert rows[rows["mask"] == 0]["dp_value"].iloc[0] == 0
        assert (rows["dp_value"] >= -1).all()


class TestFaginTa:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            TA_K,
            q_fagin_ta,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        qset = {t for q in EVAL_QUERIES for t in q}
        N = len(docs)
        dls: dict[int, int] = {}
        tf: dict[str, dict[int, int]] = {t: {} for t in qset}
        for did, text in zip(docs["doc_id"], docs["text"]):
            ts = [t for t in _raw_tokens(text) if t not in STOP_WORDS]
            dls[int(did)] = len(ts)
            for t in ts:
                if t in qset:
                    tf[t][int(did)] = tf[t].get(int(did), 0) + 1
        avgdl = sum(dls.values()) / N
        got = q_fagin_ta(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            bm: dict[int, float] = {}
            dot: dict[int, float] = {}
            ln2: dict[int, float] = {}
            for t in terms:
                df = len(tf[t])
                if df == 0:
                    continue
                idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
                idf10 = math.log10(N / df + 1.0)
                for d, f in tf[t].items():
                    bm[d] = bm.get(d, 0.0) + 2.2 * idf * f / (
                        f + 1.2 * (0.25 + 0.75 * dls[d] / avgdl)
                    )
                    dot[d] = dot.get(d, 0.0) + (f * idf10) * idf10
                    ln2[d] = ln2.get(d, 0.0) + (f * idf10) ** 2
            a6 = {
                d: int(_round_half_away(_round_half_away(v) * 1e6, 0))
                for d, v in bm.items()
            }
            b6 = {
                d: int(
                    _round_half_away(
                        _round_half_away(dot[d] / math.sqrt(ln2[d])) * 1e6, 0
                    )
                )
                for d in dot
            }
            la = sorted(a6, key=lambda d: (-a6[d], d))
            lb = sorted(b6, key=lambda d: (-b6[d], d))
            seen: dict[int, int] = {}
            stop_t = kth = thr = 0
            for t_ in range(1, len(la) + 1):
                for d in (la[t_ - 1], lb[t_ - 1]):
                    if d not in seen:
                        seen[d] = a6[d] + b6[d]
                thr = a6[la[t_ - 1]] + b6[lb[t_ - 1]]
                if len(seen) >= TA_K:
                    kth = sorted(seen.values(), reverse=True)[TA_K - 1]
                    if kth >= thr:
                        stop_t = t_
                        break
            row = got[got["qid"] == qid].iloc[0]
            assert row["stop_round"] == stop_t
            assert row["n_seen"] == len(seen)
            assert row["n_candidates"] == len(a6)
            assert row["kth_f"] == kth
            assert row["threshold_stop"] == thr

    def test_ta_early_termination(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_fagin_ta

        got = q_fagin_ta(sf_tiny)
        # the whole point: stop long before exhausting the lists
        assert (got["stop_round"] < got["n_candidates"]).all()
        assert (got["n_seen"] <= 2 * got["stop_round"]).all()
        assert (got["kth_f"] >= got["threshold_stop"]).all()
