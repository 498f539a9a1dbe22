"""Brute-force identity tests for the capacity-math / documentation
wave (Little's law, dataset card; registry 483-484)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd


class TestLittlesLaw:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_littles_law

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "user_id"])
        t = ev["ts"].astype("datetime64[us]").astype("int64")
        day = t // 86_400_000_000
        sess = (
            pd.DataFrame({"u": ev["user_id"], "d": day, "t": t})
            .groupby(["u", "d"])["t"]
            .agg(["min", "max"])
        )
        H = 3_600_000_000
        ov: dict[int, int] = {}
        arr: dict[int, int] = {}
        for _, r in sess.iterrows():
            a, z = int(r["min"]), int(r["max"])
            arr[a // H] = arr.get(a // H, 0) + 1
            for h in range(a // H, z // H + 1):
                o = max(min(z, (h + 1) * H) - max(a, h * H), 0)
                ov[h] = ov.get(h, 0) + o
        got = q_littles_law(sf_tiny)
        for _, r in got.iterrows():
            h = int(r["hour"])
            assert r["ov_us"] == ov.get(h, 0)
            assert r["arrivals"] == arr.get(h, 0)
        n = len(sess)
        dur = int((sess["max"] - sess["min"]).sum())
        T = int(sess["max"].max() - sess["min"].min())
        lam, W, L = n / (T / 1e6), dur / n / 1e6, dur / T
        assert abs(got["lambda_per_s"].iloc[0] - lam) < 1e-5
        assert abs(got["W_s"].iloc[0] - W) < 1e-5
        assert abs(got["L_avg"].iloc[0] - L) < 1e-5

    def test_identity_holds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_littles_law

        got = q_littles_law(sf_tiny)
        # L = λW exactly (both sides are Σdur/T)
        assert (got["identity_gap"] < 1e-5).all()
        # hourly occupancy mass equals total session time exactly
        assert (got["mass_check"] == 1).all()


class TestDatasetCard:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import q_dataset_card

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["text", "lang", "source"]
        )
        toks = 0
        vocab = set()
        for t in docs["text"]:
            ws = [
                w
                for w in re.sub(r"[,.;?!]", " ", (t or "").lower()).split()
                if w and w not in STOP_WORDS
            ]
            toks += len(ws)
            vocab |= set(ws)
        fp = docs["text"].map(
            lambda t: hashlib.md5((t or "").encode()).hexdigest()
        )
        dupmass = fp.value_counts()
        card = dict(zip(*q_dataset_card(sf_tiny).T.values))
        assert card["n_docs"] == len(docs)
        assert card["kept_tokens"] == toks
        assert card["vocab"] == len(vocab)
        assert card["n_sources"] == docs["source"].nunique()
        assert card["n_langs"] == docs["lang"].nunique()
        assert card["total_chars"] == docs["text"].str.len().sum()
        assert abs(card["pct_en"] - (docs["lang"] == "en").mean()) < 1e-6
        assert card["exact_dup_docs"] == dupmass[dupmass >= 2].sum()
        assert abs(card["mean_doc_tokens"] - toks / len(docs)) < 1e-6

    def test_card_is_complete(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_dataset_card

        got = q_dataset_card(sf_tiny)
        assert len(got) == 9
        assert got["metric"].is_unique
