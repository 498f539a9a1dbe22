"""Brute-force identity tests for the observability / data-gen wave
(tail-based trace sampling, synthetic query pairs; registry 455-456)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd


class TestTraceSampling:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_trace_sampling

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["ts", "user_id", "event_type"]
        )
        t = ev["ts"].astype("datetime64[us]").astype("int64")
        day = t // 86_400_000_000
        df = pd.DataFrame(
            {
                "user_id": ev["user_id"],
                "day": day,
                "t": t,
                "err": (ev["event_type"] == "error").astype(int),
            }
        )
        sess = df.groupby(["user_id", "day"]).agg(
            t0=("t", "min"), t1=("t", "max"), errs=("err", "sum")
        )
        sess["dur_s"] = (sess["t1"] - sess["t0"]) // 1_000_000
        n = len(sess)
        rank = -(-n * 95 // 100)
        p95 = int(np.sort(sess["dur_s"].to_numpy())[rank - 1])
        sess = sess.reset_index()
        sess["by_err"] = (sess["errs"] > 0).astype(int)
        sess["by_lat"] = ((sess["errs"] == 0) & (sess["dur_s"] >= p95)).astype(int)
        exp = (
            sess.groupby("day")
            .agg(
                sessions=("day", "size"),
                kept_by_error=("by_err", "sum"),
                kept_by_latency=("by_lat", "sum"),
            )
            .reset_index()
            .sort_values("day")
        )
        got = q_trace_sampling(sf_tiny)
        assert (got["p95_dur_s"] == p95).all()
        assert list(got["day"]) == list(exp["day"])
        assert list(got["sessions"]) == list(exp["sessions"])
        assert list(got["kept_by_error"]) == list(exp["kept_by_error"])
        assert list(got["kept_by_latency"]) == list(exp["kept_by_latency"])

    def test_sampling_properties(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_trace_sampling

        got = q_trace_sampling(sf_tiny)
        assert (got["kept"] <= got["sessions"]).all()
        assert (got["kept"] == got["kept_by_error"] + got["kept_by_latency"]).all()


class TestQueryGenPairs:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import q_query_gen_pairs

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        tfs = {}
        df: Counter = Counter()
        for _, r in docs.iterrows():
            toks = [
                w
                for w in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if w and w not in STOP_WORDS
            ]
            c = Counter(toks)
            tfs[int(r["doc_id"])] = c
            df.update(c.keys())
        N = len(docs)
        idf = {t: math.log10(N / d + 1.0) for t, d in df.items()}
        exp = {}
        for did, c in tfs.items():
            if len(c) < 2:
                continue
            ranked = sorted(
                ((round(tf * idf[t], 6), t) for t, tf in c.items()),
                key=lambda x: (-x[0], x[1]),
            )
            t1, t2 = ranked[0][1], ranked[1][1]
            amb = sum(1 for s in tfs.values() if t1 in s and t2 in s)
            exp[did] = (f"{t1} {t2}", amb)
        got = q_query_gen_pairs(sf_tiny)
        assert set(got["doc_id"]) == set(exp)
        for _, r in got.iterrows():
            q, a = exp[int(r["doc_id"])]
            assert (r["query"], r["ambiguity"]) == (q, a)

    def test_source_doc_always_matches(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_query_gen_pairs

        got = q_query_gen_pairs(sf_tiny)
        # the generating doc contains both terms, so ambiguity >= 1
        assert (got["ambiguity"] >= 1).all()
