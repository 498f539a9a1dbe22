"""Brute-force identity tests for the co-occurrence / doc-cosine /
survival / dense-topk / df-histogram wave (registry 162-166)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


class TestCooccurWindow:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            COOCCUR_SLOP,
            COOCCUR_TARGET,
            COOCCUR_TOPK,
            q_cooccur_window,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        counts: dict[str, int] = {}
        for txt in docs["text"]:
            toks = [t for t in txt.lower().split() if t]
            hits = [i for i, t in enumerate(toks) if t == COOCCUR_TARGET]
            if not hits:
                continue
            mask = set()
            for h in hits:
                mask.update(range(max(0, h - COOCCUR_SLOP), min(len(toks), h + COOCCUR_SLOP + 1)))
            mask -= set(hits)
            for i in mask:
                counts[toks[i]] = counts.get(toks[i], 0) + 1
        expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:COOCCUR_TOPK]
        got = q_cooccur_window(sf_tiny)
        assert list(zip(got["term"], got["c"])) == [(t, c) for t, c in expect]

    def test_target_excluded(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import COOCCUR_TARGET, q_cooccur_window

        got = q_cooccur_window(sf_tiny)
        assert COOCCUR_TARGET not in set(got["term"])


class TestDocCosine:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import (
            DOC_COSINE_SRC,
            DOC_COSINE_TOPK,
            q_doc_cosine,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        toks = dict(zip(docs["doc_id"].astype(int), _token_lists(docs["text"])))
        n = len(docs)
        df: dict[str, int] = {}
        for ts in toks.values():
            for t in set(ts):
                df[t] = df.get(t, 0) + 1
        idf = {t: math.log10(n / d + 1.0) for t, d in df.items()}

        def vec(ts):
            v: dict[str, float] = {}
            for t in ts:
                v[t] = v.get(t, 0.0) + idf[t]
            return v

        src = vec(toks[DOC_COSINE_SRC])
        srcn = math.sqrt(sum(w * w for w in src.values()))
        rows = []
        for d, ts in toks.items():
            if d == DOC_COSINE_SRC:
                continue
            v = vec(ts)
            dot = sum(w * src.get(t, 0.0) for t, w in v.items())
            nrm = math.sqrt(sum(w * w for w in v.values()))
            rows.append((d, round(dot / (nrm * srcn), 6)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        got = q_doc_cosine(sf_tiny)
        assert len(got) == DOC_COSINE_TOPK
        for (ed, ec), gd, gc in zip(rows[:DOC_COSINE_TOPK], got["doc_id"], got["cosine"]):
            assert ed == gd
            assert ec == pytest.approx(gc, abs=1e-6)

    def test_cosine_bounded(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_doc_cosine

        got = q_doc_cosine(sf_tiny)
        assert ((got["cosine"] >= 0) & (got["cosine"] <= 1.0 + 1e-9)).all()
        # ranking column sorted descending
        assert (np.diff(got["cosine"].to_numpy()) <= 1e-12).all()


class TestSurvivalTable:
    def test_matches_bruteforce_km(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SURVIVAL_EVENT, q_survival_table

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
        ev["day"] = (
            ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        ).astype(int)
        rows = []
        for _, g in ev.groupby("user_id"):
            first, last = g["day"].min(), g["day"].max()
            conv = g.loc[g["event_type"] == SURVIVAL_EVENT, "day"]
            if len(conv):
                rows.append((conv.min() - first, 1))
            else:
                rows.append((last - first, 0))
        dur = pd.DataFrame(rows, columns=["duration", "event"])
        life = (
            dur.groupby("duration")
            .agg(n_at=("event", "size"), n_event=("event", "sum"))
            .reset_index()
            .sort_values("duration")
        )
        total = life["n_at"].sum()
        n_risk = total - np.concatenate(([0], np.cumsum(life["n_at"].to_numpy())[:-1]))
        surv, s = [], 1.0
        for ne, nr in zip(life["n_event"], n_risk):
            s *= 1.0 - ne / nr
            surv.append(round(s, 6))

        got = q_survival_table(sf_tiny)
        assert list(got["duration"]) == list(life["duration"])
        assert list(got["n_risk"]) == [int(x) for x in n_risk]
        assert list(got["n_event"]) == list(life["n_event"])
        for e, g in zip(surv, got["survival"]):
            assert e == pytest.approx(g, abs=1e-6)

    def test_km_invariants(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_survival_table

        got = q_survival_table(sf_tiny)
        # survival non-increasing, risk set strictly decreasing, counts consistent
        assert (np.diff(got["survival"].to_numpy()) <= 1e-12).all()
        assert (np.diff(got["n_risk"].to_numpy()) < 0).all()
        assert (got["n_event"] + got["n_censored"] <= got["n_risk"]).all()
        assert got["n_risk"].iloc[0] == (got["n_event"] + got["n_censored"]).sum()


class TestDenseTopk:
    def test_matches_window_function(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_dense_topk

        cust = pd.read_parquet(
            f"{sf_tiny}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
        cust["bal"] = cust["c_acctbal"].round(0)
        expect = []
        for nk, g in cust.groupby("c_nationkey"):
            top2 = np.sort(g["bal"].unique())[::-1][:2]
            for rnk, v in enumerate(top2, 1):
                for ck in sorted(g.loc[g["bal"] == v, "c_custkey"]):
                    expect.append((int(nk), int(ck), float(v), rnk))
        expect.sort()
        got = q_dense_topk(sf_tiny)
        got_rows = sorted(
            zip(
                got["c_nationkey"].astype(int),
                got["c_custkey"].astype(int),
                got["bal"].astype(float),
                got["rnk"].astype(int),
            )
        )
        assert got_rows == expect

    def test_ties_all_surface(self, ray_session, sf_tiny):
        """dense_rank keeps every row at a tied value — per (nation, rnk)
        group the balances are constant and ranks are only 1 or 2."""
        from searchengine_ray.pipelines.queries import q_dense_topk

        got = q_dense_topk(sf_tiny)
        assert set(got["rnk"]) <= {1, 2}
        for (_, _), g in got.groupby(["c_nationkey", "rnk"]):
            assert g["bal"].nunique() == 1


class TestDfHistogram:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import q_df_histogram

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        df: dict[str, int] = {}
        for ts in _token_lists(docs["text"]):
            for t in set(ts):
                df[t] = df.get(t, 0) + 1
        buckets: dict[int, int] = {}
        for d in df.values():
            b = int(math.floor(math.log2(d)))
            buckets[b] = buckets.get(b, 0) + 1
        got = q_df_histogram(sf_tiny)
        assert dict(zip(got["bucket"], got["n_terms"])) == buckets
        # histogram partitions the vocabulary
        assert got["n_terms"].sum() == len(df)


class TestColumnProfile:
    def test_matches_pandas_profile(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import PROFILE_COLS, q_column_profile

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet")
        got = q_column_profile(sf_tiny).set_index("col_name")
        assert sorted(got.index) == sorted(PROFILE_COLS)
        for col in PROFILE_COLS:
            assert got.loc[col, "n_null"] == int(docs[col].isna().sum())
            assert got.loc[col, "n_distinct"] == int(docs[col].nunique())
            if docs[col].dtype == object:
                assert got.loc[col, "n_blank"] == int(
                    (docs[col].str.strip() == "").sum()
                )
            else:
                assert got.loc[col, "n_blank"] == 0

    def test_doc_id_unique(self, ray_session, sf_tiny):
        """doc_id is the primary key — profile must show it fully
        distinct with no nulls."""
        from searchengine_ray.pipelines.queries import q_column_profile

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        got = q_column_profile(sf_tiny).set_index("col_name")
        assert got.loc["doc_id", "n_distinct"] == len(docs)
        assert got.loc["doc_id", "n_null"] == 0


class TestZipfSlope:
    def test_matches_numpy_polyfit(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import q_zipf_slope

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        counts: dict[str, int] = {}
        for ts in _token_lists(docs["text"]):
            for t in ts:
                counts[t] = counts.get(t, 0) + 1
        freq = np.asarray(
            sorted(counts.values(), reverse=True), np.float64
        )
        x = np.log(np.arange(1, len(freq) + 1, dtype=np.float64))
        y = np.log(freq)
        slope, intercept = np.polyfit(x, y, 1)
        got = q_zipf_slope(sf_tiny)
        assert int(got["n_terms"].iloc[0]) == len(freq)
        assert got["slope"].iloc[0] == pytest.approx(slope, abs=1e-5)
        assert got["intercept"].iloc[0] == pytest.approx(intercept, abs=1e-5)
        # natural-language corpus: negative slope, decent fit
        assert got["slope"].iloc[0] < 0
        assert 0 < got["r2"].iloc[0] <= 1


class TestFanoFactor:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            FANO_MIN_DAYS,
            FANO_TOPK,
            q_fano_factor,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id", "ts"])
        ev["day"] = (
            ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        ).astype(int)
        daily = ev.groupby(["user_id", "day"]).size().rename("c").reset_index()
        rows = []
        for uid, g in daily.groupby("user_id"):
            c = g["c"].to_numpy(np.float64)
            if len(c) < FANO_MIN_DAYS:
                continue
            rows.append((int(uid), len(c), c.mean(), c.var()))  # population var
        rows.sort(key=lambda r: (-round(r[3] / r[2], 6), r[0]))
        got = q_fano_factor(sf_tiny)
        assert len(got) == min(FANO_TOPK, len(rows))
        for (uid, nd, m, v), row in zip(rows[: len(got)], got.itertuples()):
            assert row.user_id == uid
            assert row.n_days == nd
            assert row.mean_daily == pytest.approx(m, abs=1e-6)
            assert row.fano == pytest.approx(v / m, abs=1e-6)

    def test_fano_nonnegative_and_sorted(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_fano_factor

        got = q_fano_factor(sf_tiny)
        assert (got["fano"] >= 0).all()
        assert (np.diff(got["fano"].to_numpy()) <= 1e-12).all()


class TestHapaxRatio:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import q_hapax_ratio

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "text"])
        counts: dict[tuple, int] = {}
        for s, ts in zip(docs["source"], _token_lists(docs["text"])):
            for t in ts:
                counts[(s, t)] = counts.get((s, t), 0) + 1
        per_src: dict[str, list] = {}
        for (s, _), c in counts.items():
            v = per_src.setdefault(s, [0, 0])
            v[0] += 1
            v[1] += int(c == 1)
        got = q_hapax_ratio(sf_tiny).set_index("source")
        assert sorted(got.index) == sorted(per_src)
        for s, (vocab, hapax) in per_src.items():
            assert got.loc[s, "vocab"] == vocab
            assert got.loc[s, "hapax"] == hapax
            assert got.loc[s, "hapax_ratio"] == pytest.approx(hapax / vocab, abs=1e-6)

    def test_ratio_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_hapax_ratio

        got = q_hapax_ratio(sf_tiny)
        assert ((got["hapax_ratio"] >= 0) & (got["hapax_ratio"] <= 1)).all()
        assert (got["hapax"] <= got["vocab"]).all()
