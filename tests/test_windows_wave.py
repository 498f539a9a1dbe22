"""Interval coverage, streaks, weighted median, WoW change, bigram LM —
brute-force checks on tiny data."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestIntervalCoverage:
    def test_brute_force(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import COVER_WINDOW_US, q_interval_coverage

        out = q_interval_coverage(sf_tiny)
        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id", "ts"])
        ev["s"] = ev["ts"].astype("int64")
        for uid, g in ev.groupby("user_id"):
            ivs = sorted(zip(g["s"], g["s"] + COVER_WINDOW_US))
            covered, cur_s, cur_e = 0, None, None
            for s, e in ivs:
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        covered += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            covered += cur_e - cur_s
            row = out[out["user_id"] == uid].iloc[0]
            assert int(row["covered_us"]) == covered, uid
            assert int(row["n_events"]) == len(g)


class TestStreaks:
    def test_brute_force(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_streaks

        out = q_streaks(sf_tiny)
        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id", "ts"])
        ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
        for uid, g in ev.groupby("user_id"):
            days = sorted(set(g["day"]))
            best = run = 1
            for a, b in zip(days, days[1:]):
                run = run + 1 if b == a + 1 else 1
                best = max(best, run)
            row = out[out["user_id"] == uid].iloc[0]
            assert int(row["max_streak"]) == best, uid
            assert int(row["n_active_days"]) == len(days)


class TestWeightedMedian:
    def test_half_mass_property(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_weighted_median

        out = q_weighted_median(sf_tiny)
        li = pd.read_parquet(f"{sf_tiny}/lineitem.parquet", columns=["l_suppkey", "l_extendedprice"])
        sup = pd.read_parquet(f"{sf_tiny}/supplier.parquet")
        li["w"] = (li["l_extendedprice"] * 100).round().astype("int64")
        rev = li.groupby("l_suppkey", as_index=False)["w"].sum()
        m = rev.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        m["bal_cents"] = (m["s_acctbal"] * 100).round().astype("int64")
        for nk, g in m.groupby("s_nationkey"):
            g = g.sort_values(["bal_cents", "w"], kind="mergesort")
            cum = g["w"].cumsum()
            tot = int(g["w"].sum())
            pick = g["bal_cents"].to_numpy()[np.argmax(2 * cum.to_numpy() >= tot)]
            row = out[out["nationkey"] == nk].iloc[0]
            assert row["wmedian_acctbal"] == pick / 100.0, nk


class TestWow:
    def test_matches_pandas(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import _WEEK_US, q_wow_change

        out = q_wow_change(sf_tiny)
        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type"])
        ev["week"] = ev["ts"].astype("int64") // _WEEK_US
        cnt = ev.groupby(["event_type", "week"]).size().reset_index(name="n")
        cnt = cnt.sort_values(["event_type", "week"])
        cnt["prev"] = cnt.groupby("event_type")["n"].shift(1)
        cnt = cnt.dropna()
        assert len(out) == len(cnt)
        for r in cnt.itertuples():
            row = out[(out["event_type"] == r.event_type) & (out["week"] == r.week)].iloc[0]
            assert row["n"] == r.n
            assert abs(row["pct_change"] - (r.n - r.prev) * 100.0 / r.prev) < 1e-4


class TestBigramPpl:
    def test_zero_for_short_docs_and_positive_else(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bigram_logppl

        out = q_bigram_logppl(sf_tiny)
        assert (out.loc[out["n_bigrams"] == 0, "logppl"] == 0.0).all()
        assert (out.loc[out["n_bigrams"] > 0, "logppl"] > 0).all()

    def test_spot_doc_brute_force(self, ray_session, sf_tiny):
        import re

        from searchengine_ray.pipelines.queries import q_bigram_logppl

        out = q_bigram_logppl(sf_tiny)
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])

        def tok(t):
            return [w for w in re.sub(r"[,.;?!]", " ", t.lower()).split() if w]

        toks = {int(r.doc_id): tok(r.text) for r in docs.itertuples()}
        uni: dict[str, int] = {}
        pair: dict[tuple, int] = {}
        for tv in toks.values():
            for w in tv:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(tv, tv[1:]):
                pair[(a, b)] = pair.get((a, b), 0) + 1
        V = len(uni)
        did = int(docs["doc_id"].iloc[0])
        tv = toks[did]
        lls = [
            -np.log((pair.get((a, b), 0) + 1.0) / (uni[a] + V)) for a, b in zip(tv, tv[1:])
        ]
        expect = float(np.mean(lls)) if lls else 0.0
        got = float(out[out["doc_id"] == did]["logppl"].iloc[0])
        assert abs(got - expect) < 1e-4
