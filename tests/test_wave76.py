"""Brute-force identity tests for the query-evaluation wave
(quit accumulators + team-draft interleaving, registry 349-350)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


def _round_half_away(x: float, nd: int = 6) -> float:
    p = 10.0**nd
    return math.copysign(math.floor(abs(x) * p + 0.5) / p, x)


def _bm25_tables(sf: str):
    from searchengine_ray.analysis.stopwords import STOP_WORDS
    from searchengine_ray.pipelines.queries import EVAL_QUERIES

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
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
    return N, dls, tf, avgdl


class TestQuitAccumulators:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            QUIT_CAP,
            q_quit_accumulators,
        )

        N, dls, tf, avgdl = _bm25_tables(sf_tiny)
        got = q_quit_accumulators(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            present = sorted(
                (t for t in terms if tf[t]), key=lambda t: (len(tf[t]), t)
            )
            scores: dict[int, float] = {}
            kmin: dict[int, int] = {}
            for k, t in enumerate(present, 1):
                df = len(tf[t])
                idf = 2.2 * math.log((N - df + 0.5) / (df + 0.5) + 1.0)
                for d, f in tf[t].items():
                    scores[d] = scores.get(d, 0.0) + idf * f / (
                        f + 1.2 * (0.25 + 0.75 * dls[d] / avgdl)
                    )
                    kmin.setdefault(d, k)
                    kmin[d] = min(kmin[d], k)
            s6 = {
                d: int(_round_half_away(_round_half_away(v) * 1e6, 0))
                for d, v in scores.items()
            }
            admitted = set(
                sorted(s6, key=lambda d: (kmin[d], d))[:QUIT_CAP]
            )
            exact = sorted(s6, key=lambda d: (-s6[d], d))[:10]
            capped = sorted(
                (d for d in s6 if d in admitted), key=lambda d: (-s6[d], d)
            )[:10]
            sub = got[got["qid"] == qid].reset_index(drop=True)
            assert sub["doc_id"].tolist() == capped
            assert sub["in_exact_top10"].tolist() == [
                int(d in set(exact)) for d in capped
            ]
            for i, d in enumerate(capped):
                assert abs(sub.iloc[i]["score"] - s6[d] / 1e6) < 1e-9

    def test_cap_binds_or_exact(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_quit_accumulators

        got = q_quit_accumulators(sf_tiny)
        # every query returns a full (or near-full) page and the flag
        # is a valid 0/1 column
        assert set(got["in_exact_top10"].unique()) <= {0, 1}
        assert got.groupby("qid").size().ge(5).all()


class TestTeamDraftInterleave:
    @staticmethod
    def _draft(la, lb):
        sel, teams = [], []
        while True:
            turn = "A" if len(sel) % 2 == 0 else "B"
            prim, sec = (la, lb) if turn == "A" else (lb, la)
            nxt = next((d for d in prim if d not in sel), None)
            team = turn
            if nxt is None:
                nxt = next((d for d in sec if d not in sel), None)
                team = "B" if turn == "A" else "A"
            if nxt is None:
                break
            sel.append(nxt)
            teams.append(team)
        return sel, teams

    def test_draft_properties(self):
        la, lb = [1, 2, 3], [3, 4, 5]
        sel, teams = self._draft(la, lb)
        assert sel == [1, 3, 2, 4, 5]
        assert len(set(sel)) == len(sel)
        # identical lists -> union preserved
        sel2, _ = self._draft([7, 8], [7, 8])
        assert sel2 == [7, 8]

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            q_team_draft_interleave,
        )

        N, dls, tf, avgdl = _bm25_tables(sf_tiny)
        got = q_team_draft_interleave(sf_tiny)
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
            b6 = {
                d: int(_round_half_away(_round_half_away(v) * 1e6, 0))
                for d, v in bm.items()
            }
            t6 = {
                d: int(
                    _round_half_away(
                        _round_half_away(dot[d] / math.sqrt(ln2[d])) * 1e6, 0
                    )
                )
                for d in dot
            }
            la = sorted(b6, key=lambda d: (-b6[d], d))[:10]
            lb = sorted(t6, key=lambda d: (-t6[d], d))[:10]
            sel, teams = self._draft(la, lb)
            sub = got[got["qid"] == qid].sort_values("pos")
            assert sub["doc_id"].tolist() == sel
            assert sub["team"].tolist() == teams
            assert sub["pos"].tolist() == list(range(1, len(sel) + 1))
