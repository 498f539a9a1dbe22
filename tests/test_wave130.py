"""Brute-force identity tests for the local-graph / time-series wave
(push-based PPR, SAX symbolization; registry 457-458)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestPprPush:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PPR_PUSH_ALPHA,
            PPR_PUSH_EPS,
            PPR_PUSH_MAXSTEPS,
            PPR_PUSH_SCALE,
            PPR_PUSH_TOPK,
            q_ppr_push,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        n = len(docs)
        AN, AD = PPR_PUSH_ALPHA

        def nbrs(u):
            cand = [(u * 7 + 13) % n, (u * 31 + 5) % n, u % 10]
            return [v for v in cand if v != u]

        p = np.zeros(n, np.int64)
        r = np.zeros(n, np.int64)
        r[0] = PPR_PUSH_SCALE
        steps = 0
        for _ in range(PPR_PUSH_MAXSTEPS):
            elig = [
                u for u in range(n) if nbrs(u) and r[u] >= PPR_PUSH_EPS * len(nbrs(u))
            ]
            if not elig:
                break
            u = elig[0]
            ru = int(r[u])
            pu = ru * AN // AD
            rest = ru - pu
            half = rest // 2
            deg = len(nbrs(u))
            per = half // deg
            p[u] += pu
            r[u] = rest - half + (half - per * deg)
            for v in nbrs(u):
                r[v] += per
            steps += 1
        order = np.lexsort((np.arange(n), -p))[:PPR_PUSH_TOPK]
        got = q_ppr_push(sf_tiny)
        assert list(got["doc_id"]) == list(order)
        assert list(got["mass"]) == list(p[order])
        assert list(got["residual"]) == list(r[order])
        assert (got["steps"] == steps).all()
        assert (got["mass_total"] == int(p.sum())).all()
        assert (got["residual_total"] == int(r.sum())).all()

    def test_mass_conserved(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import PPR_PUSH_SCALE, q_ppr_push

        got = q_ppr_push(sf_tiny)
        assert int(got["mass_total"].iloc[0] + got["residual_total"].iloc[0]) == (
            PPR_PUSH_SCALE
        )
        assert (got["mass"] >= 0).all() and (got["residual"] >= 0).all()


class TestSaxSymbols:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SAX_WINDOW_DAYS, q_sax_symbols

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type"])
        day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
        daily = (
            pd.DataFrame({"et": ev["event_type"], "day": day})
            .groupby(["et", "day"])
            .size()
            .reset_index(name="c")
        )
        d0 = int(daily["day"].min())
        daily["win"] = (daily["day"] - d0) // SAX_WINDOW_DAYS
        paa = daily.groupby(["et", "win"], as_index=False)["c"].sum()
        got = q_sax_symbols(sf_tiny)
        for et, g in paa.groupby("et"):
            g = g.sort_values("win")
            v = g["c"].to_numpy(np.int64)
            sv = np.sort(v)
            nwin = len(v)
            bps = [int(sv[-(-nwin * k // 4) - 1]) for k in (1, 2, 3)]
            word = "".join(
                chr(ord("a") + sum(x > b for b in bps)) for x in v
            )
            row = got[got["event_type"] == et].iloc[0]
            assert row["n_windows"] == nwin
            assert (row["bp1"], row["bp2"], row["bp3"]) == tuple(bps)
            assert row["word"] == word

    def test_symbol_histogram_consistent(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_sax_symbols

        got = q_sax_symbols(sf_tiny)
        for _, r in got.iterrows():
            assert r["n_a"] + r["n_b"] + r["n_c"] + r["n_d"] == r["n_windows"]
            assert r["word"].count("a") == r["n_a"]
            assert len(r["word"]) == r["n_windows"]
        # quartile breakpoints are ordered
        assert ((got["bp1"] <= got["bp2"]) & (got["bp2"] <= got["bp3"])).all()
