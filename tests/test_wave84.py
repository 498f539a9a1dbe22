"""Brute-force identity tests for the query-internals/decoding wave
(galloping cost + beam decode, registry 365-366)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


def _round_half_away0(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


class TestGallopingCost:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            q_galloping_cost,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        qset = {t for q in EVAL_QUERIES for t in q}
        post: dict[str, list[int]] = {t: [] for t in qset}
        for did, text in zip(docs["doc_id"], docs["text"]):
            seen = {
                t
                for t in _raw_tokens(text)
                if t not in STOP_WORDS and t in qset
            }
            for t in seen:
                post[t].append(int(did))
        got = q_galloping_cost(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            present = sorted(
                (t for t in terms if post[t]), key=lambda t: (len(post[t]), t)
            )
            if len(present) < 2:
                assert qid not in set(got["qid"])
                continue
            a = np.sort(np.array(post[present[0]]))
            b = np.sort(np.array(post[present[1]]))
            pos = np.searchsorted(b, a, side="left")
            prev = np.concatenate([[0], pos[:-1]])
            d = pos - prev + 1
            cost = int((2 * np.floor(np.log2(d)) + 2).sum())
            row = got[got["qid"] == qid].iloc[0]
            assert (row["len_a"], row["len_b"]) == (len(a), len(b))
            assert row["n_matches"] == int(np.isin(a, b).sum())
            assert row["gallop_cost"] == cost
            assert row["linear_cost"] == len(a) + len(b)

    def test_cost_model_sane(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_galloping_cost

        got = q_galloping_cost(sf_tiny)
        # gallop cost is at least 2 comparisons per A element
        assert (got["gallop_cost"] >= 2 * got["len_a"]).all()
        # and bounded by a full binary search per element
        ub = got["len_a"] * (2 * np.ceil(np.log2(got["len_b"] + 1)) + 2)
        assert (got["gallop_cost"] <= ub).all()


class TestBeamDecode:
    @staticmethod
    def _model(sf):
        docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        cnt: dict[tuple[str, str], int] = {}
        for text in docs["text"]:
            ts = _raw_tokens(text)
            for a, b in zip(ts, ts[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
        c1: dict[str, int] = {}
        for (a, _), n in cnt.items():
            c1[a] = c1.get(a, 0) + n
        return cnt, c1

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BEAM_SEEDS,
            BEAM_STEPS,
            BEAM_WIDTH,
            q_beam_decode,
        )

        cnt, c1 = self._model(sf_tiny)
        vocab = sorted({a for a, _ in cnt} | {b for _, b in cnt})
        vi = {t: i for i, t in enumerate(vocab)}
        micro = {
            (a, b): _round_half_away0(math.log2(n / c1[a]) * 1e6)
            for (a, b), n in cnt.items()
        }
        got = q_beam_decode(sf_tiny)
        for seed in BEAM_SEEDS:
            beams = [(seed, seed, 0)]
            for _ in range(BEAM_STEPS):
                cands = []
                for bi, (seq, last, sc) in enumerate(beams):
                    for j, w in enumerate(vocab):
                        m = micro.get((last, w))
                        if m is not None:
                            cands.append((-(sc + m), bi, j))
                cands.sort()
                beams = [
                    (beams[bi][0] + " " + vocab[j], vocab[j], -ns)
                    for ns, bi, j in cands[:BEAM_WIDTH]
                ]
            sub = got[got["seed"] == seed].sort_values("rank")
            assert sub["seq"].tolist() == [s for s, _, _ in beams]
            assert sub["score_micro"].tolist() == [sc for _, _, sc in beams]

    def test_beam_dominates_greedy(self, ray_session, sf_tiny):
        """Beam rank-1 score must be >= the greedy (width-1) rollout."""
        from searchengine_ray.pipelines.queries import (
            BEAM_STEPS,
            q_beam_decode,
        )

        cnt, c1 = self._model(sf_tiny)
        micro = {
            (a, b): _round_half_away0(math.log2(n / c1[a]) * 1e6)
            for (a, b), n in cnt.items()
        }
        got = q_beam_decode(sf_tiny)
        for seed in got["seed"].unique():
            last, sc = seed, 0
            for _ in range(BEAM_STEPS):
                nxt = max(
                    ((m, b) for (a, b), m in micro.items() if a == last),
                    key=lambda x: (x[0], [-ord(c) for c in x[1]]),
                    default=None,
                )
                if nxt is None:
                    break
                # greedy tiebreak: highest micro, then lexicographically
                # smallest token (mirror of the beam's token-index order)
                best_m = max(m for (a, _), m in micro.items() if a == last)
                cands = sorted(
                    b for (a, b), m in micro.items() if a == last and m == best_m
                )
                last, sc = cands[0], sc + best_m
            top = got[(got["seed"] == seed) & (got["rank"] == 1)].iloc[0]
            assert top["score_micro"] >= sc
