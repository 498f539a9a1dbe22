"""Brute-force identity tests for the kNN/jackknife/winnowing wave
(registry 304-306)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest


class TestKnnClassify:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import KNN_K, q_knn_classify

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet")
        mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        ids = emb["vec_id"].to_numpy(np.int64)
        lab = emb["label"].to_numpy(np.int64)
        tr = ids % 2 == 0
        te = ~tr
        tn = np.sqrt((mat[tr] ** 2).sum(axis=1))
        cells: dict[tuple, int] = {}
        for i in np.flatnonzero(te):
            x = mat[i]
            cos = (mat[tr] @ x) / (tn * np.linalg.norm(x))
            cos_q = np.round(cos, 6)
            order = np.lexsort((ids[tr], -cos_q))[:KNN_K]
            votes = np.bincount(lab[tr][order], minlength=int(lab.max()) + 1)
            pred = int(np.argmax(votes))
            cells[(int(lab[i]), pred)] = cells.get((int(lab[i]), pred), 0) + 1
        want = pd.DataFrame(
            sorted((t, p, n) for (t, p), n in cells.items()),
            columns=["true_label", "pred_label", "n"],
        ).astype("int64")
        got = q_knn_classify(sf_tiny)
        pd.testing.assert_frame_equal(got, want)

    def test_counts_cover_test_split(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_knn_classify

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["vec_id"])
        n_test = int((emb["vec_id"] % 2 == 1).sum())
        got = q_knn_classify(sf_tiny)
        assert got["n"].sum() == n_test


class TestJackknifeVariance:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            JACK_BUCKETS,
            q_jackknife_variance,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["user_id", "event_type", "value"]
        )
        p = ev[ev["event_type"] == "purchase"].copy()
        p["m"] = (p["value"].round(3) * 1e3).round().astype(np.int64)
        per_user = p.groupby("user_id")["m"].sum()
        bucket = per_user.index.to_numpy(np.int64) % JACK_BUCKETS
        bk = pd.DataFrame({"b": bucket, "v": per_user.to_numpy()})
        agg = bk.groupby("b").agg(u=("v", "size"), v=("v", "sum"))
        u, v = agg["u"].to_numpy(np.int64), agg["v"].to_numpy(np.int64)
        tu, tv, nb = int(u.sum()), int(v.sum()), len(agg)
        rq = np.round((tv - v) / (tu - u) * 1e6).astype(np.int64)
        mean = rq.sum() / 1e6 / nb
        s = int(np.round(((rq / 1e6 - mean) ** 2) * 1e6).sum())
        se = math.sqrt((nb - 1.0) / nb * (s / 1e6))
        got = q_jackknife_variance(sf_tiny)
        assert got["n_buckets"].iloc[0] == nb
        assert got["users"].iloc[0] == tu
        assert got["rev_milli"].iloc[0] == tv
        assert got["theta"].iloc[0] == pytest.approx(tv / tu, abs=1e-6)
        assert got["jack_se"].iloc[0] == pytest.approx(se, abs=1e-6)

    def test_se_positive(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_jackknife_variance

        got = q_jackknife_variance(sf_tiny)
        assert got["jack_se"].iloc[0] > 0
        assert got["theta"].iloc[0] > 0


def _winnow_doc(tokens: list[str], k: int, w: int):
    """Reference winnowing: (n_grams, n_windows, selected positions)."""
    if len(tokens) < k:
        return 0, 0, set()
    grams = ["\x1f".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    h = [
        int.from_bytes(hashlib.md5(g.encode()).digest()[8:], "little")
        for g in grams
    ]
    if len(h) < w:
        return len(h), 0, set()
    sel = set()
    for s in range(len(h) - w + 1):
        window = h[s : s + w]
        m = min(window)
        # rightmost occurrence of the min
        pos = s + max(j for j, x in enumerate(window) if x == m)
        sel.add(pos)
    return len(h), len(h) - w + 1, sel


class TestWinnowing:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import (
            WINNOW_K,
            WINNOW_W,
            q_winnowing_fingerprints,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "text"])
        acc: dict[str, list[int]] = {}
        for src, ts in zip(docs["source"], _token_lists(docs["text"])):
            ng, nw, sel = _winnow_doc(list(ts), WINNOW_K, WINNOW_W)
            a = acc.setdefault(src, [0, 0, 0, 0])
            a[1] += ng
            if nw:
                a[0] += 1
                a[2] += nw
                a[3] += len(sel)
        got = q_winnowing_fingerprints(sf_tiny).set_index("source")
        assert sorted(got.index) == sorted(acc)
        for src, (nd, ng, nw, nf) in acc.items():
            row = got.loc[src]
            assert row["n_docs"] == nd
            assert row["n_grams"] == ng
            assert row["n_windows"] == nw
            assert row["n_fp"] == nf
            assert row["density"] == pytest.approx(nf / nw, abs=1e-6)

    def test_density_near_guarantee(self, ray_session, sf_tiny):
        # winnowing's expected density is 2/(w+1); every window must
        # contain at least one selection so density is in (1/w, 1]
        from searchengine_ray.pipelines.queries import WINNOW_W, q_winnowing_fingerprints

        got = q_winnowing_fingerprints(sf_tiny)
        assert ((got["density"] > 1.0 / WINNOW_W) & (got["density"] <= 1.0)).all()
        assert (got["n_fp"] <= got["n_windows"]).all()
