"""Brute-force identity tests for the local-clustering / eval-ndcg /
Mann-Whitney / attribution / unpivot / ORC-roundtrip wave (registry
236-241)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _und_edges(n: int) -> set[tuple[int, int]]:
    ids = np.arange(n, dtype=np.int64)
    e = np.concatenate(
        [
            np.stack([ids, (ids * 7 + 13) % n], axis=1),
            np.stack([ids, (ids * 31 + 5) % n], axis=1),
            np.stack([ids, ids % 10], axis=1),
        ]
    )
    e = e[e[:, 0] != e[:, 1]]
    return {(min(a, b), max(a, b)) for a, b in e.tolist()}


class TestLocalClustering:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            LOCAL_CLUSTERING_TOPK,
            q_local_clustering,
        )

        n = len(pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"]))
        und = _und_edges(n)
        adj: dict[int, set[int]] = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        rows = []
        for node, nb in adj.items():
            deg = len(nb)
            if deg < 2:
                continue
            nbl = sorted(nb)
            tri = sum(
                1
                for i in range(len(nbl))
                for j in range(i + 1, len(nbl))
                if nbl[j] in adj[nbl[i]]
            )
            coef = round(2.0 * tri / (deg * (deg - 1.0)), 6)
            rows.append((node, deg, tri, coef))
        rows.sort(key=lambda r: (-r[3], r[0]))
        expect = rows[:LOCAL_CLUSTERING_TOPK]
        got = q_local_clustering(sf_tiny)
        assert [
            (int(r.node), int(r.deg), int(r.tri)) for r in got.itertuples()
        ] == [(a, b, c) for a, b, c, _ in expect]
        np.testing.assert_allclose(
            got["coef"].to_numpy(), [c for *_, c in expect], atol=1e-6
        )


class TestEvalNdcg:
    def test_metric_contracts(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import EVAL_QUERIES, q_eval_ndcg

        got = q_eval_ndcg(sf_tiny)
        assert list(got["qid"]) == list(range(len(EVAL_QUERIES)))
        # NDCG/P@10 bounded; MRR is 0 or 1/rank with rank <= 10
        assert ((got["ndcg10"] > 0) & (got["ndcg10"] <= 1.0 + 1e-9)).all()
        assert ((got["p10"] >= 0) & (got["p10"] <= 1.0)).all()
        for v in got["mrr_full"]:
            assert v == 0.0 or any(
                abs(v - 1.0 / r) < 1e-6 for r in range(1, 11)
            )

    def test_perfect_ranker_on_degenerate_query(self, ray_session, sf_tiny):
        # single-term query: every match has rel=1, so any ranking is
        # ideal -> ndcg == 1, mrr == 1, p10 == 1 when >=10 matches
        import searchengine_ray.pipelines.queries as Q

        old = Q.EVAL_QUERIES
        Q.EVAL_QUERIES = [["join"]]
        try:
            got = Q.q_eval_ndcg(sf_tiny)
        finally:
            Q.EVAL_QUERIES = old
        assert abs(got["ndcg10"].iloc[0] - 1.0) < 1e-9
        assert got["mrr_full"].iloc[0] == 1.0
        if got["n_results"].iloc[0] >= 10:
            assert got["p10"].iloc[0] == 1.0


class TestMannWhitney:
    def test_matches_scipy_style_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_mannwhitney_u

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["event_type", "value"])
        ev = ev[ev["event_type"].isin(["click", "purchase"])].copy()
        v = np.round(ev["value"].to_numpy(np.float64), 3)
        milli = np.floor(np.abs(v * 1e3) + 0.5) * np.sign(v * 1e3)
        g1 = (ev["event_type"] == "click").to_numpy()
        order = np.argsort(milli, kind="mergesort")
        sv = milli[order]
        ranks = np.empty(len(sv), np.float64)
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[i:j] = (i + 1 + j) / 2.0
            i = j
        rank_of = np.empty(len(sv), np.float64)
        rank_of[order] = ranks
        n1 = int(g1.sum())
        n2 = len(sv) - n1
        r1 = float(rank_of[g1].sum())
        u1 = r1 - n1 * (n1 + 1) / 2.0
        _, tc = np.unique(sv, return_counts=True)
        tie = float((tc.astype(np.float64) ** 3 - tc).sum())
        N = float(len(sv))
        sigma = math.sqrt(n1 * n2 / 12.0 * ((N + 1.0) - tie / (N * (N - 1.0))))
        z = (u1 - n1 * n2 / 2.0) / sigma
        got = q_mannwhitney_u(sf_tiny)
        assert int(got["n1"].iloc[0]) == n1
        assert int(got["n2"].iloc[0]) == n2
        assert abs(got["u_stat"].iloc[0] - u1) < 1e-6
        assert abs(got["z"].iloc[0] - z) < 1e-6


class TestAttribution:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_attribution

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        credit: dict[str, list[int]] = {}
        for _, grp in ev.groupby("user_id", sort=False):
            last = None
            for r in grp.itertuples():
                if r.event_type == "purchase":
                    if last is not None:
                        v = round(r.value, 3)
                        milli = int(math.floor(abs(v * 1e3) + 0.5) * (1 if v >= 0 else -1))
                        credit.setdefault(last, []).append(milli)
                else:
                    last = r.event_type
        got = q_attribution(sf_tiny).set_index("attrib_type")
        assert set(got.index) == set(credit)
        for k, vals in credit.items():
            assert int(got.loc[k, "n"]) == len(vals)
            assert int(got.loc[k, "rev_milli"]) == sum(vals)


class TestUnpivotMetrics:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_unpivot_metrics

        c = pd.read_parquet(f"{sf_tiny}/customer.parquet")
        got = q_unpivot_metrics(sf_tiny)
        # long form: 3 metrics per nation, sorted
        assert list(got.columns) == ["c_nationkey", "metric", "value"]
        nats = sorted(c["c_nationkey"].unique())
        assert len(got) == 3 * len(nats)
        w = got.pivot(index="c_nationkey", columns="metric", values="value")
        for nat, grp in c.groupby("c_nationkey"):
            bal = np.round(grp["c_acctbal"].to_numpy(np.float64), 2)
            cents = int(
                (np.floor(np.abs(bal * 100) + 0.5) * np.sign(bal * 100)).sum()
            )
            assert int(w.loc[nat, "n_customers"]) == len(grp)
            assert int(w.loc[nat, "acct_cents"]) == cents
            assert int(w.loc[nat, "n_segments"]) == grp["c_mktsegment"].nunique()


class TestOrcRoundtrip:
    def test_digest_matches_direct_scan(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_orc_roundtrip

        li = pd.read_parquet(
            f"{sf_tiny}/lineitem.parquet",
            columns=["l_orderkey", "l_quantity", "l_returnflag"],
        )
        got = q_orc_roundtrip(sf_tiny).set_index("l_returnflag")
        for flag, grp in li.groupby("l_returnflag"):
            q = np.round(grp["l_quantity"].to_numpy(np.float64), 2)
            centi = int((np.floor(np.abs(q * 100) + 0.5) * np.sign(q * 100)).sum())
            assert int(got.loc[flag, "n"]) == len(grp)
            assert int(got.loc[flag, "key_sum"]) == int(grp["l_orderkey"].sum())
            assert int(got.loc[flag, "qty_centi"]) == centi


class TestSubstringSearch:
    def test_matches_python_containment(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SUBSTRING_PATTERN, q_substring_search

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        expect = sorted(
            int(d) for d, t in zip(docs["doc_id"], docs["text"]) if SUBSTRING_PATTERN in t
        )
        got = q_substring_search(sf_tiny)
        assert list(got["doc_id"]) == expect

    def test_trigram_pruning_is_lossless(self, ray_session, sf_tiny):
        # candidates (all-trigrams-present) must be a superset of true
        # matches: verify stage can only shrink, never invent
        import searchengine_ray.pipelines.queries as Q

        old = Q.SUBSTRING_PATTERN
        Q.SUBSTRING_PATTERN = "scan slow"
        try:
            docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
            expect = sorted(int(d) for d, t in zip(docs["doc_id"], docs["text"]) if "scan slow" in t)
            got = Q.q_substring_search(sf_tiny)
            assert list(got["doc_id"]) == expect
        finally:
            Q.SUBSTRING_PATTERN = old


class TestBootstrapCI:
    def test_matches_bruteforce_lcg(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import BOOTSTRAP_B, q_bootstrap_ci

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["event_id", "event_type", "value"])
        p = ev[ev["event_type"] == "purchase"]
        ids = p["event_id"].to_numpy(np.int64)
        v = np.round(p["value"].to_numpy(np.float64), 3)
        milli = (np.floor(np.abs(v * 1e3) + 0.5) * np.sign(v * 1e3)).astype(np.int64)
        MOD = 2147483647
        thresholds = np.array([0.36787944117144233, 0.7357588823428847, 0.919698602928606,
                               0.9810118431238462, 0.9963401531726563, 0.9994058151824183])
        means = []
        for b in range(BOOTSTRAP_B):
            key = (ids * 131071 + b * 524287) % MOD
            u = ((16807 * key) % MOD) / MOD
            w = np.searchsorted(thresholds, u, side="right")
            means.append(float((w * milli).sum()) / float(w.sum()))
        means = np.sort(np.asarray(means))
        got = q_bootstrap_ci(sf_tiny)
        assert int(got["n"].iloc[0]) == len(ids)
        assert abs(got["mean_value"].iloc[0] - milli.mean() / 1e3) < 1e-6
        assert abs(got["ci_lo_milli"].iloc[0] - means[1]) < 1e-6
        assert abs(got["ci_hi_milli"].iloc[0] - means[BOOTSTRAP_B - 2]) < 1e-6
        assert got["ci_lo_milli"].iloc[0] <= got["mean_value"].iloc[0] * 1e3 <= got["ci_hi_milli"].iloc[0]


class TestRedirectChains:
    def test_matches_walk(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_redirect_chains

        n = len(pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"]))
        nodes = np.arange(n, dtype=np.int64)
        term = np.where(nodes < 50, nodes, nodes % 50)
        hops = nodes // 50
        got = q_redirect_chains(sf_tiny).set_index("terminal")
        for t in np.unique(term):
            assert int(got.loc[t, "n_urls"]) == int((term == t).sum())
            assert int(got.loc[t, "max_hops"]) == int(hops[term == t].max())

    def test_dataset_tier_identity(self, ray_session):
        # the pointer-doubling Dataset path must equal the numpy tier
        from searchengine_ray.functions.graph import resolve_pointers

        n = 900
        nodes = np.arange(n, dtype=np.int64)
        ptrs = np.where(nodes % 7 == 0, nodes, np.maximum(nodes - 13, 0))
        # ensure acyclic: node 0 is terminal (0 % 7 == 0)
        dense = resolve_pointers(nodes, ptrs, dense_gate=10**9)
        dist = resolve_pointers(nodes, ptrs, dense_gate=0)
        pd.testing.assert_frame_equal(dense, dist)
