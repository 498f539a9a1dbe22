"""Wave 177: randomized response LDP + single-linkage/MST identity —
vs direct replay / brute agglomeration."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestRrLdp:
    def test_matches_channel_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            RR_KEEP_NUM,
            _md5_low64,
            q_rr_ldp,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["event_id", "event_type"])
        types = sorted(ev["event_type"].unique())
        k = len(types)
        tidx = {t: i for i, t in enumerate(types)}
        rep = np.zeros(k, np.int64)
        true = np.zeros(k, np.int64)
        for e, t in zip(ev["event_id"], ev["event_type"]):
            true[tidx[t]] += 1
            draw = _md5_low64(f"{e}#rr")
            if draw % 4 < RR_KEEP_NUM:
                rep[tidx[t]] += 1
            else:
                rep[(draw // 4) % k] += 1
        got = q_rr_ldp(sf_tiny).set_index("event_type")
        for i, t in enumerate(types):
            assert got.loc[t, "true_count"] == true[i]
            assert got.loc[t, "reported_count"] == rep[i]
        n = int(true.sum())
        p = RR_KEEP_NUM / 4.0
        est = (rep - n * (1 - p) / k) / p
        assert np.allclose(got.loc[types, "estimate"].to_numpy(), np.round(est, 6))

    def test_channel_inversion_identity(self, ray_session, sf_small):
        """The estimator inverts the RR channel exactly: p·t̂_v +
        n(1−p)/k == c_v for every type, and Σt̂ = n. (On near-uniform
        data debiasing can RAISE absolute error — the estimator trades
        bias for variance — so the invariant, not error reduction, is
        the correctness property.)"""
        from searchengine_ray.pipelines.queries import RR_KEEP_NUM, q_rr_ldp

        got = q_rr_ldp(sf_small)
        n = got["true_count"].sum()
        k = len(got)
        p = RR_KEEP_NUM / 4.0
        recon = p * got["estimate"] + n * (1 - p) / k
        assert np.allclose(recon, got["reported_count"], atol=1e-3)
        assert abs(got["estimate"].sum() - n) < 1e-3


class TestSingleLinkage:
    def test_matches_brute_agglomeration(self, ray_session, sf_tiny):
        """Brute single-link agglomerative clustering (merge closest
        pair of clusters by min inter-cluster distance, stop at τ)
        must give the same cluster count as the MST cut."""
        from searchengine_ray.pipelines.queries import (
            q_single_linkage,
            round_half_away,
        )

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
        emb = emb.sort_values("vec_id").reset_index(drop=True)
        M = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
        n = len(M)
        iu, ju = np.triu_indices(n, k=1)
        micro = np.rint(
            round_half_away(((M[iu] - M[ju]) ** 2).sum(axis=1), 6) * 1e6
        ).astype(np.int64)
        got = q_single_linkage(sf_tiny)
        for r in got.itertuples():
            tau = r.tau_micro
            # components of the thresholded graph by union-find
            parent = list(range(n))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for e in np.flatnonzero(micro <= tau):
                a, b = find(int(iu[e])), find(int(ju[e]))
                if a != b:
                    parent[max(a, b)] = min(a, b)
            n_comp = len({find(x) for x in range(n)})
            assert r.n_clusters == n_comp, r.permille

    def test_cluster_count_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_single_linkage

        got = q_single_linkage(sf_tiny).sort_values("permille")
        c = got["n_clusters"].to_numpy()
        assert (np.diff(c) <= 0).all()  # higher τ merges more
        assert (got["n_clusters"] >= 1).all()
        assert (got["n_clusters"] <= got["n_points"]).all()
