"""Brute-force identity tests for the online-algorithms wave
(ski rental + move-to-front, registry 403-404)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestSkiRental:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SKI_BUY, q_ski_rental

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["user_id", "ts"]
        )
        day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
        days = (
            pd.DataFrame({"u": ev["user_id"], "d": day})
            .groupby("u")["d"]
            .nunique()
        )
        got = q_ski_rental(sf_tiny)
        for _, r in got.iterrows():
            d = days[r["user_id"]]
            online = d if d < SKI_BUY else SKI_BUY - 1 + SKI_BUY
            opt = min(d, SKI_BUY)
            assert r["active_days"] == d
            assert r["online_cost"] == online
            assert r["opt_cost"] == opt
            assert abs(r["ratio_micro"] - round(online / opt * 1e6)) <= 1

    def test_competitive_bound(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SKI_BUY, q_ski_rental

        got = q_ski_rental(sf_tiny)
        bound = int((2 - 1 / SKI_BUY) * 1e6)
        assert (got["ratio_micro"] <= bound).all()
        assert (got["online_cost"] >= got["opt_cost"]).all()


class TestMoveToFront:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            MTF_STRIDE,
            q_move_to_front,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        stream = []
        for d, t in zip(docs["doc_id"], docs["text"]):
            if d % MTF_STRIDE == 0:
                ts = _raw_tokens(t)
                if ts:
                    stream.append(ts[0])
        freq = pd.Series(stream).value_counts()
        static_pos = {
            t: i + 1
            for i, t in enumerate(
                sorted(freq.index, key=lambda t: (-freq[t], t))
            )
        }
        mtf = sorted(set(stream))
        mc: dict[str, int] = {}
        sc: dict[str, int] = {}
        for t in stream:
            p = mtf.index(t) + 1
            mc[t] = mc.get(t, 0) + p
            sc[t] = sc.get(t, 0) + static_pos[t]
            mtf.pop(p - 1)
            mtf.insert(0, t)
        got = q_move_to_front(sf_tiny)
        assert got["tok"].tolist() == sorted(mc)
        for _, r in got.iterrows():
            assert r["n_requests"] == freq[r["tok"]]
            assert r["mtf_cost"] == mc[r["tok"]]
            assert r["static_cost"] == sc[r["tok"]]

    def test_mtf_exploits_locality(self):
        """On a bursty stream MTF beats the static list."""
        stream = ["a"] * 5 + ["b"] * 5 + ["c"] * 5 + ["a"] * 5
        mtf = sorted(set(stream))
        mtf_total = 0
        for t in stream:
            p = mtf.index(t) + 1
            mtf_total += p
            mtf.pop(p - 1)
            mtf.insert(0, t)
        freq = pd.Series(stream).value_counts()
        static_pos = {
            t: i + 1
            for i, t in enumerate(
                sorted(freq.index, key=lambda t: (-freq[t], t))
            )
        }
        static_total = sum(static_pos[t] for t in stream)
        assert mtf_total <= static_total
