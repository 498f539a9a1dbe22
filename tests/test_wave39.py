"""Brute-force identity tests for the silhouette / feature-hashing /
Simpson-paradox wave (registry 267-269)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestSilhouette:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        import ray.data as rd

        from searchengine_ray.functions.vectors import kmeans_fit
        from searchengine_ray.pipelines.queries import q_silhouette_score

        ds = rd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
        _, labels = kmeans_fit(ds, k=8, iters=3)
        lab = labels.to_pandas().sort_values("vec_id").reset_index(drop=True)
        c = lab["cluster"].to_numpy(np.int64)
        t = pd.read_parquet(f"{sf_tiny}/embeddings.parquet").sort_values("vec_id")
        X = np.stack([np.asarray(v, np.float64) for v in t["embedding"]])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        D = 1.0 - Xn @ Xn.T
        per_cluster: dict[int, list[float]] = {}
        for i in range(len(X)):
            same = (c == c[i])
            n_own = int(same.sum())
            if n_own > 1:
                a = D[i, same].sum() / (n_own - 1)
                b = min(
                    D[i, c == oc].mean() for oc in np.unique(c) if oc != c[i]
                )
                s = (b - a) / max(a, b)
            else:
                s = 0.0
            per_cluster.setdefault(int(c[i]), []).append(s)
        got = q_silhouette_score(sf_tiny).set_index("cluster")
        for cl, vals in per_cluster.items():
            assert int(got.loc[cl, "n"]) == len(vals)
            assert abs(got.loc[cl, "silhouette"] - np.mean(vals)) < 1e-5

    def test_range(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_silhouette_score

        got = q_silhouette_score(sf_tiny)
        assert ((got["silhouette"] >= -1 - 1e-9) & (got["silhouette"] <= 1 + 1e-9)).all()


class TestFeatureHashing:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.dedup import _md5_hash_lists
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import FEATURE_HASH_BUCKETS, q_feature_hashing

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        vocab = sorted({t for ts in _token_lists(docs["text"]) for t in ts})
        hs = _md5_hash_lists(pd.Series([vocab]))[0]
        buckets = (hs % np.uint64(FEATURE_HASH_BUCKETS)).astype(np.int64)
        load = pd.Series(buckets).value_counts()
        spectrum = load.value_counts().sort_index()
        got = q_feature_hashing(sf_tiny)
        assert list(got["load"]) == list(spectrum.index)
        assert list(got["n_buckets"]) == list(spectrum.values)
        # conservation: sum(load * n_buckets) == vocabulary size
        assert int((got["load"] * got["n_buckets"]).sum()) == len(vocab)


class TestSimpsonParadox:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_simpson_paradox

        o = pd.read_parquet(f"{sf_tiny}/orders.parquet", columns=["o_custkey"])
        cnt = o.groupby("o_custkey").size()
        c = pd.read_parquet(
            f"{sf_tiny}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
        bal = np.round(c["c_acctbal"].to_numpy(np.float64), 2)
        c = c.assign(
            x=c["c_custkey"].map(cnt).fillna(0).astype(np.int64),
            y=(np.floor(np.abs(bal * 100) + 0.5) * np.sign(bal * 100)).astype(np.int64),
        )

        def slope(g):
            x = g["x"].to_numpy(np.float64)
            y = g["y"].to_numpy(np.float64)
            return ((x * y).sum() - x.sum() * y.sum() / len(g)) / (
                (x * x).sum() - x.sum() ** 2 / len(g)
            )

        pooled = slope(c)
        opp = sum(
            (slope(g) > 0) != (pooled > 0) for _, g in c.groupby("c_nationkey")
        )
        got = q_simpson_paradox(sf_tiny)
        assert abs(got["pooled_slope"].iloc[0] - pooled) < 1e-4
        assert int(got["n_groups"].iloc[0]) == c["c_nationkey"].nunique()
        assert int(got["n_opposite_sign"].iloc[0]) == opp
