"""Brute-force identity tests for the spectral/scheduling wave
(co-occurrence eigenvector + WFQ, registry 375-376)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestCooccurEigen:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EIGEN_ITERS,
            q_cooccur_eigen,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        cnt: dict[tuple[str, str], int] = {}
        for text in docs["text"]:
            ts = _raw_tokens(text)
            for a, b in zip(ts, ts[1:]):
                k = (a, b) if a <= b else (b, a)
                cnt[k] = cnt.get(k, 0) + 1
        vocab = sorted({a for a, _ in cnt} | {b for _, b in cnt})
        vi = {t: i for i, t in enumerate(vocab)}
        A = np.zeros((len(vocab), len(vocab)))
        for (a, b), n in cnt.items():
            A[vi[a], vi[b]] += n
            if a != b:
                A[vi[b], vi[a]] += n
        x = np.ones(len(vocab))
        lam = 1.0
        for _ in range(EIGEN_ITERS):
            y = A @ x
            lam = float(np.abs(y).max())
            x = y / lam
        got = q_cooccur_eigen(sf_tiny)
        assert got["term"].tolist() == vocab
        for i, (_, r) in enumerate(got.iterrows()):
            assert r["score"] == pytest.approx(x[i], abs=5.1e-7)
            assert r["eigenvalue"] == pytest.approx(lam, abs=5.1e-7)

    def test_eigenpair_property(self, ray_session, sf_tiny):
        """At convergence A x ~= lambda x (Rayleigh residual small)."""
        from searchengine_ray.pipelines.queries import q_cooccur_eigen

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        cnt: dict[tuple[str, str], int] = {}
        for text in docs["text"]:
            ts = _raw_tokens(text)
            for a, b in zip(ts, ts[1:]):
                k = (a, b) if a <= b else (b, a)
                cnt[k] = cnt.get(k, 0) + 1
        got = q_cooccur_eigen(sf_tiny)
        vocab = got["term"].tolist()
        vi = {t: i for i, t in enumerate(vocab)}
        A = np.zeros((len(vocab), len(vocab)))
        for (a, b), n in cnt.items():
            A[vi[a], vi[b]] += n
            if a != b:
                A[vi[b], vi[a]] += n
        x = got["score"].to_numpy()
        lam = got["eigenvalue"].iloc[0]
        resid = np.abs(A @ x - lam * x).max() / lam
        assert resid < 0.01


class TestWfqSchedule:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            WFQ_SCALE,
            WFQ_WEIGHTS,
            q_wfq_schedule,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["ts", "event_id", "event_type"]
        )
        ev["day"] = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
        ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
        sums: dict[str, int] = {}
        ns: dict[str, int] = {}
        for _, g in ev.groupby("day"):
            g = g.sort_values(["t", "event_id"]).reset_index(drop=True)
            k = g.groupby("event_type").cumcount() + 1
            w = g["event_type"].map(WFQ_WEIGHTS).to_numpy(np.int64)
            fin = k.to_numpy(np.int64) * WFQ_SCALE // w
            order = np.lexsort((k.to_numpy(), g["event_type"].to_numpy(), fin))
            pos = np.empty(len(g), np.int64)
            pos[order] = np.arange(1, len(g) + 1)
            for tn, p in zip(g["event_type"], pos):
                sums[tn] = sums.get(tn, 0) + int(p)
                ns[tn] = ns.get(tn, 0) + 1
        got = q_wfq_schedule(sf_tiny)
        assert got["tenant"].tolist() == sorted(ns)
        for _, r in got.iterrows():
            assert r["n"] == ns[r["tenant"]]
            assert r["sum_pos"] == sums[r["tenant"]]
            assert r["avg_pos"] == pytest.approx(
                sums[r["tenant"]] / ns[r["tenant"]], abs=5.1e-7
            )

    def test_weights_shape_service(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            WFQ_WEIGHTS,
            q_wfq_schedule,
        )

        got = q_wfq_schedule(sf_tiny).set_index("tenant")
        # the heaviest tenant's normalized mean position beats the
        # lightest's (positions scale with backlog share, so compare
        # rate-adjusted: avg_pos / n is smaller for heavier weights
        # only in aggregate — assert the heaviest beats the lightest
        # on same-volume normalization)
        heavy = max(WFQ_WEIGHTS, key=lambda t: WFQ_WEIGHTS[t])
        light = min(WFQ_WEIGHTS, key=lambda t: WFQ_WEIGHTS[t])
        assert (
            got.loc[heavy, "avg_pos"] / got.loc[heavy, "n"]
            <= got.loc[light, "avg_pos"] / got.loc[light, "n"] * 5
        )
