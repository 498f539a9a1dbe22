"""Brute-force identity tests for the topic-eval / resilience wave
(NPMI topic coherence, circuit-breaker replay; registry 463-464)."""

from __future__ import annotations

import itertools
import math
import re
from collections import Counter

import numpy as np
import pandas as pd


class TestTopicCoherence:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import TOPIC_TERMS, q_topic_coherence

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        per: Counter = Counter()
        doc_sets = {}
        for _, r in docs.iterrows():
            toks = [
                t
                for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if t and t not in STOP_WORDS
            ]
            doc_sets[int(r["doc_id"])] = set(toks)
            for t in toks:
                per[(r["source"], t)] += 1
        glob: Counter = Counter()
        tots: Counter = Counter()
        for (s, t), c in per.items():
            glob[t] += c
            tots[s] += c
        Tg = sum(glob.values())
        topics = {}
        for s in {k[0] for k in per}:
            terms = [(t, per[(s, t)]) for (ss, t) in per if ss == s]
            ranked = sorted(
                terms,
                key=lambda tc: (-round(tc[1] * Tg / (tots[s] * glob[tc[0]]), 6), tc[0]),
            )
            topics[s] = sorted(t for t, _ in ranked[:TOPIC_TERMS])
        N = len(docs)
        df: Counter = Counter()
        for st in doc_sets.values():
            df.update(st)
        got = q_topic_coherence(sf_tiny)
        for _, r in got.iterrows():
            ts = topics[r["source"]]
            assert r["topic"] == " ".join(ts)
            vals = []
            for a, b in itertools.combinations(ts, 2):
                cab = sum(1 for st in doc_sets.values() if a in st and b in st)
                if cab == 0:
                    continue
                pab = cab / N
                vals.append(
                    math.log(pab / ((df[a] / N) * (df[b] / N))) / -math.log(pab)
                )
            assert r["n_pairs"] == len(vals)
            exp = np.mean(vals) if vals else 0.0
            assert abs(r["coherence"] - exp) < 1e-6

    def test_npmi_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_topic_coherence

        got = q_topic_coherence(sf_tiny)
        assert ((got["coherence"] >= -1.000001) & (got["coherence"] <= 1.000001)).all()


class TestCircuitBreaker:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CB_COOLDOWN,
            CB_OPEN_MIN_N,
            q_circuit_breaker,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type"])
        hour = ev["ts"].astype("datetime64[s]").astype("int64") // 3600
        h = (
            pd.DataFrame({"hour": hour, "err": (ev["event_type"] == "error").astype(int)})
            .groupby("hour")
            .agg(n=("err", "size"), e=("err", "sum"))
            .reset_index()
            .sort_values("hour")
        )
        state, cd = "closed", 0
        exp = []
        for _, r in h.iterrows():
            prev = state
            n, e = int(r["n"]), int(r["e"])
            if state == "closed":
                if n >= CB_OPEN_MIN_N and 2 * e >= n:
                    state, cd = "open", CB_COOLDOWN
            elif state == "open":
                cd -= 1
                if cd <= 0:
                    state = "half_open"
            else:
                if 5 * e < n:
                    state = "closed"
                else:
                    state, cd = "open", CB_COOLDOWN
            if state != prev:
                exp.append((int(r["hour"]), prev, state, e, n))
        got = q_circuit_breaker(sf_tiny)
        assert [tuple(r) for r in got.itertuples(index=False, name=None)] == exp

    def test_transition_legality(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_circuit_breaker

        got = q_circuit_breaker(sf_tiny)
        legal = {
            ("closed", "open"),
            ("open", "half_open"),
            ("half_open", "closed"),
            ("half_open", "open"),
        }
        assert set(zip(got["from_state"], got["to_state"])) <= legal
