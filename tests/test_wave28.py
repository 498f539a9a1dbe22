"""Brute-force identity tests for the assortativity / full-outer-recon /
set-ops / doc-entropy / Simpson / Welch wave (registry 230-235)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _edges(n: int) -> np.ndarray:
    ids = np.arange(n, dtype=np.int64)
    e = np.concatenate(
        [
            np.stack([ids, (ids * 7 + 13) % n], axis=1),
            np.stack([ids, (ids * 31 + 5) % n], axis=1),
            np.stack([ids, ids % 10], axis=1),
        ]
    )
    e = e[e[:, 0] != e[:, 1]]
    return np.unique(e[:, 0] * np.int64(n) + e[:, 1])


class TestAssortativity:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_assortativity

        n = len(pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"]))
        ekey = _edges(n)
        src, dst = ekey // n, ekey % n
        outdeg = np.bincount(src, minlength=n)
        indeg = np.bincount(dst, minlength=n)
        dx = outdeg[src].astype(np.int64)
        dy = indeg[dst].astype(np.int64)
        m = float(len(dx))
        sx, sy = float(dx.sum()), float(dy.sum())
        sxy = float((dx * dy).sum())
        sxx, syy = float((dx * dx).sum()), float((dy * dy).sum())
        r = (m * sxy - sx * sy) / (
            math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
        )
        got = q_assortativity(sf_tiny)
        assert int(got["m"].iloc[0]) == len(ekey)
        assert abs(got["assortativity"].iloc[0] - r) < 1e-6


class TestFullOuterRecon:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_full_outer_recon

        o = pd.read_parquet(
            f"{sf_tiny}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        split = pd.Timestamp("1998-01-01")
        o["cents"] = np.rint(o["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        in_a = o["o_orderdate"] < split
        g = o.groupby("o_custkey").apply(
            lambda d: pd.Series(
                {
                    "n_a": int((d["o_orderdate"] < split).sum()),
                    "n_b": int((d["o_orderdate"] >= split).sum()),
                    "ca": int(d.loc[d["o_orderdate"] < split, "cents"].sum()),
                    "cb": int(d.loc[d["o_orderdate"] >= split, "cents"].sum()),
                }
            ),
            include_groups=False,
        )
        status = np.where(
            (g["n_a"] > 0) & (g["n_b"] > 0),
            "both",
            np.where(g["n_a"] > 0, "first_only", "second_only"),
        )
        g = g.assign(status=status)
        expect = (
            g.groupby("status")
            .agg(customers=("status", "size"), cents_first=("ca", "sum"), cents_second=("cb", "sum"))
            .reset_index()
            .sort_values("status")
            .reset_index(drop=True)
        )
        got = q_full_outer_recon(sf_tiny)
        pd.testing.assert_frame_equal(
            got, expect.astype({"customers": "int64", "cents_first": "int64", "cents_second": "int64"})
        )

    def test_total_conservation(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_full_outer_recon

        got = q_full_outer_recon(sf_tiny)
        o = pd.read_parquet(f"{sf_tiny}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        total_cents = int(np.rint(o["o_totalprice"].to_numpy() * 100.0).astype(np.int64).sum())
        assert int(got["cents_first"].sum() + got["cents_second"].sum()) == total_cents
        assert int(got["customers"].sum()) == o["o_custkey"].nunique()


class TestSetOps:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import q_set_ops

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "text"])
        srcs = sorted(docs["source"].unique())[:2]
        vocab = {s: set() for s in srcs}
        sub = docs[docs["source"].isin(srcs)]
        for s, ts in zip(sub["source"], _token_lists(sub["text"])):
            vocab[s].update(ts)
        a, b = vocab[srcs[0]], vocab[srcs[1]]
        got = q_set_ops(sf_tiny)
        assert got["src_a"].iloc[0] == srcs[0] and got["src_b"].iloc[0] == srcs[1]
        assert int(got["common"].iloc[0]) == len(a & b)
        assert int(got["only_a"].iloc[0]) == len(a - b)
        assert int(got["only_b"].iloc[0]) == len(b - a)
        assert abs(got["jaccard"].iloc[0] - len(a & b) / len(a | b)) < 1e-6


class TestDocEntropy:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import DOC_ENTROPY_TOPK, q_doc_entropy

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        rows = []
        for did, ts in zip(docs["doc_id"].astype(int), _token_lists(docs["text"])):
            _, counts = np.unique(np.asarray(ts, dtype=object), return_counts=True)
            L = int(counts.sum())
            c = counts.astype(np.float64)
            h = math.log2(L) - float((c * np.log2(c)).sum()) / L
            rows.append((did, L, round(h, 6)))
        rows.sort(key=lambda r: (-r[2], r[0]))
        expect = rows[:DOC_ENTROPY_TOPK]
        got = q_doc_entropy(sf_tiny)
        assert [
            (int(r.doc_id), int(r.n_tokens)) for r in got.itertuples()
        ] == [(d, L) for d, L, _ in expect]
        np.testing.assert_allclose(
            got["entropy"].to_numpy(), [h for _, _, h in expect], atol=2e-6
        )


class TestSimpsonDiversity:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import q_simpson_diversity

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "text"])
        per_src: dict[str, dict[str, int]] = {}
        for s, ts in zip(docs["source"], _token_lists(docs["text"])):
            d = per_src.setdefault(s, {})
            for t in ts:
                d[t] = d.get(t, 0) + 1
        got = q_simpson_diversity(sf_tiny).set_index("source")
        for s, d in per_src.items():
            c = np.asarray(list(d.values()), np.int64)
            N = int(c.sum())
            simpson = 1.0 - float((c * (c - 1)).sum()) / (N * (N - 1.0))
            row = got.loc[s]
            assert int(row["vocab"]) == len(d)
            assert int(row["n_tokens"]) == N
            assert abs(row["simpson"] - simpson) < 1e-6


class TestWelchTtest:
    def test_matches_scipy_style_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_welch_ttest

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "n_chars"])
        got = q_welch_ttest(sf_tiny).set_index("source")
        for s, grp in docs.groupby("source"):
            x1 = grp["n_chars"].to_numpy(np.float64)
            x2 = docs.loc[docs["source"] != s, "n_chars"].to_numpy(np.float64)
            v1, v2 = x1.var(ddof=1), x2.var(ddof=1)
            se1, se2 = v1 / len(x1), v2 / len(x2)
            t = (x1.mean() - x2.mean()) / math.sqrt(se1 + se2)
            dof = (se1 + se2) ** 2 / (
                se1**2 / (len(x1) - 1) + se2**2 / (len(x2) - 1)
            )
            row = got.loc[s]
            assert int(row["n"]) == len(x1)
            assert abs(row["t_stat"] - t) < 1e-5
            assert abs(row["dof"] - dof) < 1e-3
