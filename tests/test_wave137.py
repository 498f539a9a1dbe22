"""Brute-force identity tests for the storage-dedup / web-LM wave
(CDC chunk dedup, stupid-backoff trigram LM; registry 471-472)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pandas as pd


def _cdc_bounds(t: str):
    from searchengine_ray.pipelines.queries import (
        CDC_BASE,
        CDC_MASK,
        CDC_MOD,
        CDC_WINDOW,
    )

    cp = [ord(c) for c in t]
    L = len(cp)
    cuts = []
    if L >= CDC_WINDOW:
        for i in range(L - CDC_WINDOW + 1):
            h = 0
            for j in range(CDC_WINDOW):
                h = (h + cp[i + j] * pow(CDC_BASE, CDC_WINDOW - 1 - j, CDC_MOD)) % CDC_MOD
            if h % CDC_MASK == 0:
                cuts.append(i + CDC_WINDOW)
    return sorted(set([0] + cuts + [L]))


class TestCdcDedup:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cdc_dedup

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        perdoc = []
        for _, r in docs.iterrows():
            b = _cdc_bounds(r["text"])
            occ: dict[str, list[int]] = {}
            for a, e in zip(b[:-1], b[1:]):
                if e <= a:
                    continue
                h = hashlib.md5(r["text"][a:e].encode()).hexdigest()
                x = occ.setdefault(h, [0, 0])
                x[0] += 1
                x[1] += e - a
            for h, (o, ch) in occ.items():
                perdoc.append((int(r["doc_id"]), r["source"], h, o, ch))
        pdf = pd.DataFrame(perdoc, columns=["doc_id", "source", "h", "occ", "chars"])
        ndocs = pdf.groupby("h")["doc_id"].nunique()
        shared = set(ndocs[ndocs >= 2].index)
        got = q_cdc_dedup(sf_tiny).set_index("source")
        for s, g in pdf.groupby("source"):
            row = got.loc[s]
            assert row["chunks"] == int(g["occ"].sum())
            assert row["total_chars"] == int(g["chars"].sum())
            assert row["shared_chars"] == int(g[g["h"].isin(shared)]["chars"].sum())

    def test_share_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cdc_dedup

        got = q_cdc_dedup(sf_tiny)
        assert (got["shared_chars"] <= got["total_chars"]).all()
        assert ((got["shared_share"] >= 0) & (got["shared_share"] <= 1)).all()


class TestStupidBackoff:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_stupid_backoff

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["text", "source"]
        )
        toklists = [
            (
                r["source"],
                [
                    t
                    for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                    if t
                ],
            )
            for _, r in docs.iterrows()
        ]
        C: Counter = Counter()
        for _, ts in toklists:
            for i in range(len(ts)):
                C[ts[i]] += 1
                if i + 1 < len(ts):
                    C[f"{ts[i]} {ts[i + 1]}"] += 1
                if i + 2 < len(ts):
                    C[f"{ts[i]} {ts[i + 1]} {ts[i + 2]}"] += 1
        T = sum(c for g, c in C.items() if " " not in g)
        agg: dict[str, list] = {}
        for s, ts in toklists:
            a = agg.setdefault(s, [0, 0, 0, 0, 0.0])
            for i in range(2, len(ts)):
                w1, w2, w3 = ts[i - 2], ts[i - 1], ts[i]
                tri = C.get(f"{w1} {w2} {w3}", 0)
                if tri:
                    sc = tri / C[f"{w1} {w2}"]
                    a[1] += 1
                elif C.get(f"{w2} {w3}", 0):
                    sc = 0.4 * C[f"{w2} {w3}"] / C[w2]
                    a[2] += 1
                else:
                    sc = 0.16 * C[w3] / T
                    a[3] += 1
                a[0] += 1
                a[4] += math.log(sc)
        got = q_stupid_backoff(sf_tiny).set_index("source")
        for s, (n, t3, b2, u1, ls) in agg.items():
            row = got.loc[s]
            assert (row["n_scored"], row["n_tri"], row["n_bi"], row["n_uni"]) == (
                n,
                t3,
                b2,
                u1,
            )
            assert abs(row["mean_logscore"] - ls / n) < 1e-6

    def test_ladder_partitions(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_stupid_backoff

        got = q_stupid_backoff(sf_tiny)
        assert (got["n_tri"] + got["n_bi"] + got["n_uni"] == got["n_scored"]).all()
        # scores are probabilities-ish: log-scores are negative on average
        assert (got["mean_logscore"] < 0).all()
