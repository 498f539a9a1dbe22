"""Brute-force identity tests for the query-understanding / SRE wave
(query segmentation DP, SLO burn alerts; registry 447-448)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


class TestQuerySegment:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            QSEG_MAXLEN,
            QSEG_QUERY,
            QSEG_W,
            q_query_segment,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        Q = QSEG_QUERY
        spans = [
            (i, j)
            for i in range(len(Q))
            for j in range(i + 1, min(len(Q), i + QSEG_MAXLEN) + 1)
        ]
        counts = {s: 0 for s in spans}
        for t in docs["text"]:
            ts = [
                w for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split() if w
            ]
            for i, j in spans:
                seg, L = Q[i:j], j - i
                counts[(i, j)] += sum(
                    1 for p in range(len(ts) - L + 1) if ts[p : p + L] == seg
                )

        def sc(i, j):
            return counts[(i, j)] * QSEG_W ** (j - i - 1)

        best = [0] * (len(Q) + 1)
        back = [0] * (len(Q) + 1)
        for j in range(1, len(Q) + 1):
            cand = [
                (best[i] + sc(i, j), i) for i in range(max(0, j - QSEG_MAXLEN), j)
            ]
            best[j], back[j] = max(cand, key=lambda t: (t[0], -t[1]))
        segs, j = [], len(Q)
        while j > 0:
            segs.append((back[j], j))
            j = back[j]
        segs.reverse()
        got = q_query_segment(sf_tiny)
        assert len(got) == len(segs)
        for (i, j), (_, r) in zip(segs, got.iterrows()):
            assert r["phrase"] == " ".join(Q[i:j])
            assert r["count"] == counts[(i, j)]
            assert r["score"] == sc(i, j)
        assert (got["total_score"] == best[len(Q)]).all()

    def test_segments_cover_query(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import QSEG_QUERY, q_query_segment

        got = q_query_segment(sf_tiny)
        assert " ".join(got["phrase"]) == " ".join(QSEG_QUERY)
        assert got["score"].sum() == got["total_score"].iloc[0]


class TestSloBurn:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SLO_BUDGET,
            SLO_FAST_BURN,
            SLO_SLOW_BURN,
            q_slo_burn,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type"])
        hour = ev["ts"].astype("datetime64[s]").astype("int64") // 3600
        df = pd.DataFrame({"hour": hour, "err": (ev["event_type"] == "error").astype(int)})
        h = df.groupby("hour").agg(n=("err", "size"), e=("err", "sum")).reset_index()
        h["win6"] = h["hour"] // 6
        s = h.groupby("win6").agg(n6=("n", "sum"), e6=("e", "sum")).reset_index()
        m = h.merge(s, on="win6").sort_values("hour")
        got = q_slo_burn(sf_tiny)
        assert list(got["hour"]) == list(m["hour"])
        assert list(got["n"]) == list(m["n"])
        assert list(got["e"]) == list(m["e"])
        fast = m["e"] / m["n"] / SLO_BUDGET
        slow = m["e6"] / m["n6"] / SLO_BUDGET
        assert np.allclose(got["burn_1h"], fast, atol=1e-6)
        assert np.allclose(got["burn_6h"], slow, atol=1e-6)
        exp_alert = ((fast > SLO_FAST_BURN) & (slow > SLO_SLOW_BURN)).astype(int)
        assert list(got["alert"]) == list(exp_alert)

    def test_alert_needs_both_windows(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SLO_FAST_BURN,
            SLO_SLOW_BURN,
            q_slo_burn,
        )

        got = q_slo_burn(sf_tiny)
        alerted = got[got["alert"] == 1]
        assert (alerted["burn_1h"] > SLO_FAST_BURN - 1e-9).all()
        assert (alerted["burn_6h"] > SLO_SLOW_BURN - 1e-9).all()
        quiet = got[(got["burn_1h"] <= SLO_FAST_BURN)]
        assert (quiet["alert"] == 0).all()
