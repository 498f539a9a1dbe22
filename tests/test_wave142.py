"""Brute-force identity tests for the click-model / sketch wave
(position bias, Count-Min calibration; registry 481-482)."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd


class TestPositionBias:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            POSBIAS_MAX_POS,
            q_position_bias,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet",
            columns=["ts", "user_id", "event_id", "event_type"],
        )
        ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
        ev["day"] = ev["t"] // 86_400_000_000
        agg: dict[int, list[int]] = {}
        for _, g in ev.groupby(["user_id", "day"]):
            g = g.sort_values(["t", "event_id"])
            for p, et in enumerate(g["event_type"], start=1):
                if p > POSBIAS_MAX_POS:
                    break
                a = agg.setdefault(p, [0, 0])
                a[0] += 1
                a[1] += int(et == "click")
        got = q_position_bias(sf_tiny)
        c1 = agg[1][1] / agg[1][0]
        for p in sorted(agg):
            row = got[got["pos"] == p].iloc[0]
            assert (row["impressions"], row["clicks"]) == tuple(agg[p])
            ctr = agg[p][1] / agg[p][0]
            assert abs(row["ctr"] - ctr) < 1e-6
            assert abs(row["exam_ratio"] - ctr / c1) < 1e-5

    def test_impressions_decrease(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_position_bias

        got = q_position_bias(sf_tiny)
        # fewer sessions reach deeper positions
        assert got["impressions"].is_monotonic_decreasing
        assert abs(got["exam_ratio"].iloc[0] - 1.0) < 1e-9


class TestCmsError:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.functions.sketches import (
            CMS_D,
            CMS_W,
            _md5_lower64_ints,
        )
        from searchengine_ray.pipelines.queries import CMS_ERR_TOPK, q_cms_error

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        cnt: Counter = Counter()
        for t in docs["text"]:
            cnt.update(
                w
                for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split()
                if w and w not in STOP_WORDS
            )
        table = np.zeros((CMS_D, CMS_W), np.int64)
        for term, c in cnt.items():
            h = _md5_lower64_ints(np.asarray([term], dtype=object))[0]
            for j in range(CMS_D):
                table[j, int((h >> np.uint64(20 * j)) % np.uint64(CMS_W))] += c
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_ERR_TOPK]
        got = q_cms_error(sf_tiny).set_index("term")
        for term, c in top:
            h = _md5_lower64_ints(np.asarray([term], dtype=object))[0]
            est = min(
                table[j, int((h >> np.uint64(20 * j)) % np.uint64(CMS_W))]
                for j in range(CMS_D)
            )
            row = got.loc[term]
            assert row["exact"] == c
            assert row["estimate"] == est

    def test_one_sided_error(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cms_error

        got = q_cms_error(sf_tiny)
        # CMS never underestimates
        assert (got["estimate"] >= got["exact"]).all()
        assert (got["abs_err"] >= 0).all()
