"""Brute-force identity tests for the federated / planner wave
(FedAvg vs global OLS, query performance prediction; registry 473-474)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _xy(sf_dir):
    from searchengine_ray.analysis.stopwords import STOP_WORDS

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "n_chars", "source"]
    )
    rows = []
    for _, r in docs.iterrows():
        k = len(
            [
                t
                for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if t and t not in STOP_WORDS
            ]
        )
        if k:
            rows.append((r["source"], float(k), float(r["n_chars"])))
    return pd.DataFrame(rows, columns=["source", "x", "y"])


def _ols(g):
    n = len(g)
    sx, sy = g["x"].sum(), g["y"].sum()
    sxx, sxy = (g["x"] ** 2).sum(), (g["x"] * g["y"]).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (sy - slope * sx) / n, slope


class TestFedavgOls:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_fedavg_ols

        df = _xy(sf_tiny)
        got = q_fedavg_ols(sf_tiny).set_index("name")
        fi = fs = 0.0
        ntot = 0
        for s, g in df.groupby("source"):
            i_, s_ = _ols(g)
            row = got.loc[s]
            assert row["n"] == len(g)
            assert abs(row["intercept"] - i_) < 1e-4
            assert abs(row["slope"] - s_) < 1e-6
            fi += len(g) * i_
            fs += len(g) * s_
            ntot += len(g)
        gi, gs = _ols(df)
        assert abs(got.loc["federated", "slope"] - fs / ntot) < 1e-6
        assert abs(got.loc["global", "slope"] - gs) < 1e-6
        assert abs(got["slope_gap"].iloc[0] - abs(fs / ntot - gs)) < 1e-6

    def test_federated_is_weighted_mean(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_fedavg_ols

        got = q_fedavg_ols(sf_tiny)
        locals_ = got[~got["name"].isin(["federated", "global"])]
        fed = got[got["name"] == "federated"].iloc[0]
        w = locals_["n"] / locals_["n"].sum()
        assert abs((w * locals_["slope"]).sum() - fed["slope"]) < 1e-4
        # the federated slope lies inside the local slope envelope
        assert locals_["slope"].min() - 1e-9 <= fed["slope"] <= locals_["slope"].max() + 1e-9


class TestQppCandidates:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            _engine,
            q_qpp_candidates,
        )

        eng = _engine(sf_tiny)
        import pyarrow.parquet as pq

        n = pq.read_metadata(f"{sf_tiny}/documents.parquet").num_rows
        got = q_qpp_candidates(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            sets = [set(int(x) for x in eng.search_keyword(t)) for t in terms]
            prod = 1.0
            for s in sets:
                prod *= 1 - len(s) / n
            pred = n * (1 - prod)
            actual = len(set().union(*sets))
            row = got[got["qid"] == qid].iloc[0]
            assert row["dfs"] == ",".join(str(len(s)) for s in sets)
            assert abs(row["predicted"] - pred) < 1e-5
            assert row["actual"] == actual
            assert abs(row["ratio"] - actual / pred) < 1e-6

    def test_independence_overestimates(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_qpp_candidates

        got = q_qpp_candidates(sf_tiny)
        # actual can never exceed the corpus, prediction is positive
        assert (got["predicted"] > 0).all()
        assert (got["actual"] >= 1).all()
