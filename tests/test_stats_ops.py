"""Tests for quantiles / bigrams / centroids / NOT-search / prefix-terms."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


class TestQuantiles:
    def test_exact_matches_numpy_disc(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.quantiles import exact_quantiles

        rng = np.random.default_rng(7)
        x = rng.integers(0, 50, size=5000)
        ds = rd.from_pandas(pd.DataFrame({"v": x}))
        qs = [0.1, 0.25, 0.5, 0.77, 0.9, 0.999]
        out = exact_quantiles(ds, "v", qs)
        xs = np.sort(x)
        for q, got in zip(qs, out["value"]):
            idx = max(0, math.ceil(q * len(xs)) - 1)
            assert got == xs[idx], q

    def test_grouped(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.quantiles import grouped_quantiles

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c"], size=3000),
                "v": np.round(rng.normal(size=3000), 2),
            }
        )
        out = grouped_quantiles(rd.from_pandas(df), "k", "v", [0.5], quantize=2)
        for k, sub in df.groupby("k"):
            xs = np.sort(np.round(sub["v"].to_numpy(), 2))
            idx = max(0, math.ceil(0.5 * len(xs)) - 1)
            got = out[(out["k"] == k) & (out["q"] == 0.5)]["value"].iloc[0]
            assert got == xs[idx]

    def test_nulls_skipped(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.quantiles import exact_quantiles

        df = pd.DataFrame({"v": [1.0, None, 3.0, None, 5.0]})
        out = exact_quantiles(rd.from_pandas(df), "v", [0.5])
        assert out["value"].iloc[0] == 3.0


class TestBigrams:
    def test_matches_bruteforce(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.ngrams import bigram_counts

        texts = [
            "the quick, brown fox. the quick dog",
            "quick brown; quick brown",
            "",
            "one",
            "a  b   a  b a",  # runs of spaces → empty tokens dropped
        ]
        ds = rd.from_pandas(pd.DataFrame({"text": texts}))
        out = bigram_counts(ds)
        # brute force with the same tokenizer rules
        import re

        cnt: dict = {}
        for t in texts:
            toks = [
                w
                for w in re.split(r"[ \t\n\x0b\f\r]+", re.sub(r"[,.;?!]", " ", t.lower()))
                if w
            ]
            for a, b in zip(toks, toks[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
        got = {(r.t1, r.t2): r.n for r in out.itertuples()}
        assert got == cnt

    def test_topk_deterministic_ties(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.ngrams import bigram_counts

        ds = rd.from_pandas(pd.DataFrame({"text": ["x y", "a b", "m n"]}))
        out = bigram_counts(ds, top_k=2)
        # all counts are 1 → ties break (t1, t2) ascending
        assert out[["t1", "t2"]].values.tolist() == [["a", "b"], ["m", "n"]]


class TestCentroids:
    def test_matches_numpy(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.vectors import group_centroids

        rng = np.random.default_rng(11)
        labels = rng.integers(0, 4, size=400)
        mat = rng.normal(size=(400, 8)).astype(np.float32)
        df = pd.DataFrame({"label": labels, "embedding": list(mat)})
        out = group_centroids(rd.from_pandas(df), "label")
        for lbl in range(4):
            want = np.round(mat[labels == lbl].astype(np.float64).mean(axis=0), 6)
            got = out[out["label"] == lbl].sort_values("dim")["c"].to_numpy()
            assert np.allclose(got, want, atol=2e-6)

    def test_ragged_raises(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.vectors import group_centroids

        df = pd.DataFrame({"label": [0, 0], "embedding": [[1.0, 2.0], [1.0]]})
        with pytest.raises(Exception):
            group_centroids(rd.from_pandas(df), "label")


class TestEngineNotAndPrefix:
    @pytest.fixture(scope="class")
    def engine(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import _engine

        return _engine(sf_tiny)

    def test_not_search_set_algebra(self, engine):
        inc = set(engine.search_and(["join", "window"]))
        exc = set(engine.search_or(["slow", "zebra"]))
        got = set(engine.search_not(["join", "window"], ["slow", "zebra"]))
        assert got == inc - exc
        assert len(got) > 0

    def test_not_search_empty_include(self, engine):
        assert len(engine.search_not(["zzznotaterm"], ["join"])) == 0

    def test_prefix_terms_df_parity(self, engine):
        top = engine.prefix_terms("s", 5)
        assert len(top) == 5
        dfs = [d for _, d in top]
        assert dfs == sorted(dfs, reverse=True)
        for t, df in top:
            assert t.startswith("s")
            assert df == engine.doc_frequency(t), t

    def test_prefix_empty_raises(self, engine):
        with pytest.raises(ValueError):
            engine.prefix_terms("")

    def test_more_like_this_bruteforce(self, engine):
        src = set(engine.doc_terms(7))
        assert src
        got = engine.more_like_this(7, 5)
        # brute force via per-term searches
        from collections import Counter

        cnt: Counter = Counter()
        for t in src:
            for d in engine.search_keyword(t):
                cnt[int(d)] += 1
        cnt.pop(7, None)
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert got == want

    def test_more_like_this_missing_doc(self, engine):
        assert engine.more_like_this(10**12) == []


class TestPii:
    def test_redact_counts_and_text(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.pii import redact_pii

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "mail me at a.b-c%d@ex-site.co.uk now",
                    "call 555-123-4567 or +123-456-7890",
                    "no pii here",
                    "x@y.io and z@w.org, 111-222-3333",
                ],
            }
        )
        out = redact_pii(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
        assert out["n_emails"].tolist() == [1, 0, 0, 2]
        assert out["n_phones"].tolist() == [0, 2, 0, 1]
        assert out["redacted"].iloc[0] == "mail me at <EMAIL> now"
        assert out["redacted"].iloc[1] == "call <PHONE> or <PHONE>"
        assert out["redacted"].iloc[3] == "<EMAIL> and <EMAIL>, <PHONE>"

    def test_email_digits_not_double_counted_as_phone(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.pii import redact_pii

        df = pd.DataFrame({"doc_id": [1], "text": ["u555-123-4567x@ex.com"]})
        out = redact_pii(rd.from_pandas(df)).to_pandas()
        assert out["n_emails"].iloc[0] == 1
        assert out["n_phones"].iloc[0] == 0


class TestDecontaminate:
    def test_shared_ngram_flagged(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.decontaminate import (
            benchmark_gram_set,
            contaminated_ids,
        )

        bench = rd.from_pandas(
            pd.DataFrame({"doc_id": [100], "text": ["alpha beta gamma delta epsilon"]})
        )
        corpus = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "x y alpha beta gamma z",  # shares the 3-gram
                        "alpha beta zeta gamma",  # no shared 3-gram
                        "delta epsilon",  # too short for 3-gram overlap? has none of len 3
                    ],
                }
            )
        )
        grams = benchmark_gram_set(bench, n=3)
        assert "alpha beta gamma" in grams
        out = contaminated_ids(corpus, grams, n=3).to_pandas()
        assert sorted(out["doc_id"].tolist()) == [1]

    def test_stopwords_removed_before_grams(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.decontaminate import benchmark_gram_set

        # "the" is a stopword → gram skips it
        b = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["alpha the beta gamma"]}))
        grams = benchmark_gram_set(b, n=3)
        assert grams == {"alpha beta gamma"}


class TestConnectedComponents:
    def test_matches_union_find(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.components import (
            connected_components,
            dedup_clusters,
        )

        rng = np.random.default_rng(5)
        edges = [(i, i + 1) for i in range(5)]  # a diameter-5 chain
        for i in range(100, 105):  # a clique
            edges += [(i, j) for j in range(i + 1, 105)]
        for _ in range(40):  # random sparse pairs
            a, b = rng.integers(200, 260, 2)
            if a != b:
                edges.append((int(a), int(b)))
        df = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
        want = dedup_clusters(df)
        # distributed propagation path AND driver fast path agree
        for gate in (0, 10**6):
            got = (
                connected_components(rd.from_pandas(df), small_input_edges=gate)
                .to_pandas()
                .sort_values("node")
                .reset_index(drop=True)
            )
            assert got["node"].tolist() == want["doc_id"].tolist(), gate
            assert got["label"].tolist() == want["cluster"].tolist(), gate

    def test_single_edge(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.components import connected_components

        df = pd.DataFrame({"doc_a": [9], "doc_b": [3]})
        got = connected_components(rd.from_pandas(df), small_input_edges=0).to_pandas()
        assert sorted(got["node"]) == [3, 9]
        assert set(got["label"]) == {3}


class TestSpell:
    def test_levenshtein_kernel_vs_dp(self):
        import random
        import string

        from searchengine_ray.functions.spell import levenshtein_batch

        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            return dp[-1]

        rng = random.Random(1)
        terms = np.array(
            ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(0, 12))) for _ in range(300)],
            dtype=object,
        )
        for q in ["", "a", "query", "windoq"]:
            got = levenshtein_batch(terms, q)
            assert [int(x) for x in got] == [lev(t, q) for t in terms], q

    def test_suggest_orders_by_dist_then_df(self, ray_session, sf_tiny):
        from searchengine_ray.functions.spell import suggest_terms
        from searchengine_ray.pipelines.queries import documents_index

        idx = documents_index(sf_tiny, "punct")
        out = suggest_terms(idx, "dat", max_dist=2, k=5)
        assert len(out) > 0
        assert (out["dist"] <= 2).all()
        key = list(zip(out["dist"], -out["df"], out["term"]))
        assert key == sorted(key)


class TestCollocationsPMI:
    def test_hand_computed(self, ray_session):
        import math

        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.ngrams import collocations_pmi

        ds = rd.from_arrow(
            pa.table({"text": pa.array(["a b a b", "a b c"], pa.string())})
        )
        out = collocations_pmi(ds, top_k=2)
        # tokens: T=7 (a:3 b:3 c:1); pairs: (a,b)x3 (b,a)x1 (b,c)x1 → B=5
        assert out.iloc[0][["t1", "t2", "n"]].tolist() == ["a", "b", 3]
        want = math.log2((3 / 5) / ((3 / 7) * (3 / 7)))
        assert abs(out.iloc[0]["pmi"] - round(want, 6)) < 1e-9
        assert out.iloc[1][["t1", "t2", "n"]].tolist() == ["b", "a", 1]


class TestSketches:
    def test_heavy_hitters_exact(self, ray_session):
        """Two-pass HH == full exact groupby top-k, even with a tiny
        capacity that forces heavy per-batch truncation."""
        import ray.data as rd

        from searchengine_ray.functions.sketches import heavy_hitters

        rng = np.random.default_rng(3)
        # Zipf-ish vocabulary: term{i} with frequency ~ 1/(i+1)
        words = [f"w{i}" for i in range(200)]
        docs = [
            " ".join(rng.choice(words, p=_zipf_p(200), size=50))
            for _ in range(300)
        ]
        ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(8)
        got = heavy_hitters(ds, top_k=10, capacity=64)
        # oracle: flat exact counts
        from collections import Counter

        c = Counter(w for d in docs for w in d.split())
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(map(tuple, got.itertuples(index=False))) == want

    def test_heavy_hitters_fallback_on_weak_certificate(self, ray_session):
        """Uniform frequencies defeat the MG certificate → exact fallback
        still returns the true top-k."""
        import ray.data as rd

        from searchengine_ray.functions.sketches import heavy_hitters

        docs = [f"u{i % 97} u{(i * 13) % 97}" for i in range(500)]
        ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(8)
        got = heavy_hitters(ds, top_k=5, capacity=4)
        from collections import Counter

        c = Counter(w for d in docs for w in d.split())
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert list(map(tuple, got.itertuples(index=False))) == want

    def test_hll_registers_match_single_pass(self, ray_session):
        """Distributed register merge == single-pass register build."""
        import ray.data as rd

        from searchengine_ray.functions.sketches import (
            hll_estimate,
            hll_register_batch,
            hll_registers,
        )
        import pyarrow as pa

        vals = np.arange(20_000, dtype=np.int64) % 7_321  # 7321 distinct
        ds = rd.from_arrow(pa.table({"user_id": pa.array(vals)})).repartition(6)
        got = hll_registers(ds, "user_id")
        want = (
            hll_register_batch(pa.table({"user_id": pa.array(vals)}), "user_id")
            .to_pandas()
            .sort_values("register")
            .reset_index(drop=True)
            .astype({"register": "int64", "rho": "int64"})
        )
        pd.testing.assert_frame_equal(got, want)
        est = hll_estimate(got)
        assert abs(est - 7_321) / 7_321 < 0.05  # p=12 → ~1.6% std error

    def test_hll_estimate_small_range_correction(self):
        from searchengine_ray.functions.sketches import hll_estimate

        regs = pd.DataFrame({"register": [0, 5, 9], "rho": [1, 2, 1]})
        est = hll_estimate(regs)
        assert 2.0 < est < 6.0  # linear counting regime, 3 distinct-ish


def _zipf_p(n):
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


class TestRegexSearch:
    def test_counts_match_python_re(self, ray_session, sf_tiny):
        import re

        import duckdb

        from searchengine_ray.pipelines.queries import _GREP_PATTERN, q_regex_search

        got = q_regex_search(sf_tiny).set_index("doc_id")["n_matches"]
        docs = duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_tiny}/documents.parquet'"
        ).df()
        pat = re.compile(_GREP_PATTERN)
        want = {
            int(r.doc_id): len(pat.findall(r.text))
            for r in docs.itertuples()
            if pat.search(r.text)
        }
        assert got.to_dict() == want
        assert (got > 0).all()  # zero-match docs filtered out




class TestSnapshotDiff:
    def test_statuses_match_modular_rule(self, ray_session, sf_tiny):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.queries import q_snapshot_diff

        got = q_snapshot_diff(sf_tiny)
        ids = pq.read_table(
            f"{sf_tiny}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_numpy()
        removed = set(ids[ids % 13 == 0].tolist())
        added = set((ids[ids % 11 == 0] + 10_000_000).tolist())
        changed = set(ids[(ids % 13 != 0) & (ids % 7 == 0)].tolist())
        by = {s: set(g["doc_id"]) for s, g in got.groupby("status")}
        assert by.get("removed", set()) == removed
        assert by.get("added", set()) == added
        assert by.get("changed", set()) == changed
        assert len(got) == len(removed) + len(added) + len(changed)


class TestQueryExpansion:
    def test_expansion_structure(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            QE_SEED,
            _engine,
            q_query_expansion,
        )

        out = q_query_expansion(sf_tiny)
        assert list(out["rank"]) == list(range(1, len(out) + 1))
        assert len(out) == 20
        # expanded ranking differs from the seed-only ranking (the
        # feedback terms actually moved documents)
        seed_only = _engine(sf_tiny).search_bm25(QE_SEED, topk=20)
        assert [d for d, _ in seed_only] != list(out["doc_id"])

    def test_doc_ids_filter_matches_postfilter(self, ray_session, sf_tiny):
        from searchengine_ray.functions.keywords import doc_keywords
        from searchengine_ray.pipelines.queries import documents_index

        idx = documents_index(sf_tiny, "punct")
        sel = [0, 3, 7]
        a = doc_keywords(idx, k=5, doc_ids=sel).to_pandas()
        b = doc_keywords(idx, k=5).to_pandas()
        b = b[b["doc_id"].isin(sel)]
        key = ["doc_id", "rank"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )








class TestCustdist:
    def test_matches_pandas_leftjoin(self, ray_session, sf_tiny):
        import duckdb

        from searchengine_ray.pipelines.queries import q_custdist

        got = q_custdist(sf_tiny)
        want = duckdb.sql(f"""
            WITH o AS (SELECT o_custkey, count(*) AS c_count
                       FROM '{sf_tiny}/orders.parquet' GROUP BY 1)
            SELECT coalesce(o.c_count, 0) AS c_count, count(*) AS custdist
            FROM '{sf_tiny}/customer.parquet' c
            LEFT JOIN o ON c.c_custkey = o.o_custkey GROUP BY 1
        """).df()
        g = got.set_index("c_count")["custdist"].to_dict()
        w = want.set_index("c_count")["custdist"].to_dict()
        assert g == {int(k): int(v) for k, v in w.items()}


class TestPercentileCont:
    def test_interpolation_matches_numpy(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.quantiles import exact_quantiles_cont

        rng = np.random.RandomState(7)
        x = np.round(rng.lognormal(0, 1, 5000), 3)
        ds = rd.from_arrow(pa.table({"value": pa.array(x)})).repartition(6)
        got = exact_quantiles_cont(ds, "value", [0.0, 0.25, 0.5, 0.9, 1.0])
        want = np.quantile(x, [0.0, 0.25, 0.5, 0.9, 1.0], method="linear")
        np.testing.assert_allclose(got["value"].to_numpy(), want, rtol=1e-12)






class TestDatasetSplit:
    def test_split_shares_and_totals(self, ray_session, sf_tiny):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.queries import q_dataset_split

        out = q_dataset_split(sf_tiny).set_index("split")
        n = pq.read_metadata(f"{sf_tiny}/documents.parquet").num_rows
        assert int(out["n_docs"].sum()) == n
        # 80/10/10 within hash noise
        assert 0.6 < out.loc["train", "n_docs"] / n < 0.95
        assert set(out.index) == {"train", "val", "test"}

    def test_split_is_reproducible(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_dataset_split

        a = q_dataset_split(sf_tiny)
        b = q_dataset_split(sf_tiny)
        pd.testing.assert_frame_equal(a, b)


class TestTermDrift:
    def test_directions_and_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_term_drift

        out = q_term_drift(sf_tiny)
        r = out[out["direction"] == "rising"]
        f = out[out["direction"] == "falling"]
        assert len(r) == 10 and len(f) == 10
        assert r["lr"].min() >= f["lr"].max()  # movers don't overlap
        # a term only in half 1 must have positive lr, only-half-0 negative
        only1 = out[(out["n0"] == 0) & (out["n1"] > 0)]
        assert (only1["lr"] > 0).all()


class TestRoundHalfAway:
    def test_matches_duckdb_on_grid_halves(self):
        import duckdb

        from searchengine_ray.pipelines.queries import round_half_away

        # 195/384 = 0.5078125: exactly on the 6dp half — np.round gives
        # .507812 (half-even), SQL round() gives .507813
        vals = [195 / 384, 0.1234565, -0.5078125, 1.25e-6, 0.0]
        got = [float(round_half_away(v)) for v in vals]
        want = [
            duckdb.sql(f"SELECT round({v!r}::DOUBLE, 6)").fetchone()[0] for v in vals
        ]
        assert got == want
        assert float(round_half_away(195 / 384)) != float(np.round(195 / 384, 6))




class TestTokensetDedup:
    def test_reordered_text_collapses(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        import searchengine_ray.pipelines.queries as Q

        t = pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "alpha beta gamma",
                    "gamma alpha beta alpha",  # same token set, reordered+repeated
                    "alpha beta delta",
                    "unrelated words here",
                ],
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = Q.q_tokenset_dedup(str(tmp_path))
        assert len(out) == 1
        assert out.iloc[0]["n_docs"] == 2 and out.iloc[0]["keep_doc"] == 1






class TestRoundingProperties:
    def test_round_half_away_matches_duckdb_randomized(self):
        import duckdb

        from searchengine_ray.pipelines.queries import round_half_away

        rng = np.random.RandomState(11)
        # mix: arbitrary doubles, dyadic-exact ratios, negatives
        vals = np.concatenate(
            [
                rng.uniform(-10, 10, 200),
                rng.randint(1, 1000, 100) / rng.choice([2, 4, 8, 16, 32, 64], 100),
                [0.0, -0.0000005, 0.0000005, 195 / 384],
            ]
        )
        got = round_half_away(vals).tolist()
        lits = ", ".join(f"({v!r}::DOUBLE)" for v in vals)
        want = [
            r[0]
            for r in duckdb.sql(
                f"SELECT round(v, 6) FROM (VALUES {lits}) t(v)"
            ).fetchall()
        ]
        assert got == want

    def test_round_half_away_nd_param(self):
        import duckdb

        from searchengine_ray.pipelines.queries import round_half_away

        for nd in (0, 1, 3):
            vals = [2.25, 2.35, -2.25, 0.5, 1.5, 2.5, 1.0005]
            got = [float(round_half_away(v, nd)) for v in vals]
            want = [
                duckdb.sql(f"SELECT round({v!r}::DOUBLE, {nd})").fetchone()[0]
                for v in vals
            ]
            assert got == want, nd






