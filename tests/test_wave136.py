"""Brute-force identity tests for the dedup-quality / attribution wave
(family chaining audit, Markov removal effect; registry 469-470)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


class TestFamilyChaining:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            q_dedup_clusters,
            q_family_chaining,
        )

        fams = q_dedup_clusters(sf_tiny)
        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).set_index("doc_id")["text"]

        def sh(d):
            ts = [
                t
                for t in re.sub(r"[,.;?!]", " ", (docs.loc[d] or "").lower()).split()
                if t
            ]
            if not ts:
                return set()
            if len(ts) < 3:
                return {" ".join(ts)}
            return {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}

        got = q_family_chaining(sf_tiny)
        sizes = fams.groupby("cluster").size()
        big = sizes[sizes >= 2].index
        assert set(got["cluster"]) == set(int(c) for c in big)
        for _, r in got.iterrows():
            ds_ = sorted(
                int(d) for d in fams[fams["cluster"] == r["cluster"]]["doc_id"]
            )
            js = []
            for i, a in enumerate(ds_):
                for b in ds_[i + 1 :]:
                    sa, sb = sh(a), sh(b)
                    if not sa and not sb:
                        js.append(1.0)
                    else:
                        inter = len(sa & sb)
                        js.append(round(inter / (len(sa) + len(sb) - inter), 6))
            assert r["n_docs"] == len(ds_)
            assert r["n_pairs"] == len(js)
            assert abs(r["min_j"] - min(js)) < 1e-9
            assert abs(r["max_j"] - max(js)) < 1e-9
            assert r["chained"] == int(min(js) < 0.5)

    def test_direct_pairs_above_threshold(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_family_chaining

        got = q_family_chaining(sf_tiny)
        # every family was built from >= 0.5 pairs, so max is at least 0.5
        assert (got["max_j"] >= 0.5).all()
        assert (got["min_j"] <= got["max_j"]).all()


class TestRemovalEffect:
    def _chains(self, sf_dir):
        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["ts", "user_id", "event_id", "event_type"],
        )
        ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
        ev["day"] = ev["t"] // 86_400_000_000
        trans = {}
        for _, g in ev.groupby(["user_id", "day"]):
            g = g.sort_values(["t", "event_id"])
            path, conv = [], False
            for e in g["event_type"]:
                if e == "purchase":
                    conv = True
                    break
                path.append(e)
            prev = "START"
            for c in path:
                trans[(prev, c)] = trans.get((prev, c), 0) + 1
                prev = c
            d = "CONV" if conv else "NULL"
            trans[(prev, d)] = trans.get((prev, d), 0) + 1
        return trans

    def _prob(self, trans, removed, channels, iters):
        t = {}
        for (s, d), n in trans.items():
            if s == removed:
                continue
            if d == removed:
                d = "NULL"
            t[(s, d)] = t.get((s, d), 0) + n
        tot = {}
        for (s, _), n in t.items():
            tot[s] = tot.get(s, 0) + n
        P = {k: n / tot[k[0]] for k, n in t.items()}
        states = ["START"] + [c for c in channels if c != removed]
        v = {s: 0.0 for s in states}
        for _ in range(iters):
            nv = {}
            for s in states:
                acc = 0.0
                for d in sorted({k[1] for k in P if k[0] == s}):
                    p = P[(s, d)]
                    acc += p * (
                        1.0 if d == "CONV" else (0.0 if d == "NULL" else v.get(d, 0.0))
                    )
                nv[s] = acc
            v = nv
        return v["START"]

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            RE_CHANNELS,
            RE_ITERS,
            q_removal_effect,
        )

        trans = self._chains(sf_tiny)
        base = self._prob(trans, None, RE_CHANNELS, RE_ITERS)
        got = q_removal_effect(sf_tiny).set_index("channel")
        for c in RE_CHANNELS:
            rp = self._prob(trans, c, RE_CHANNELS, RE_ITERS)
            row = got.loc[c]
            assert abs(row["base_prob"] - base) < 1e-6
            assert abs(row["removed_prob"] - rp) < 1e-6
            assert abs(row["effect"] - (base - rp) / base) < 1e-5

    def test_effects_bounded(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_removal_effect

        got = q_removal_effect(sf_tiny)
        assert (got["removed_prob"] <= got["base_prob"] + 1e-9).all()
        assert ((got["effect"] >= -1e-9) & (got["effect"] <= 1 + 1e-9)).all()
