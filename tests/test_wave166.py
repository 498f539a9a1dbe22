"""Wave 166: Shapley attribution + SimRank — vs direct recomputation
and game-theoretic / fixed-point properties."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd


class TestShapleyAttrib:
    def _direct(self, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
        types = sorted(t for t in ev["event_type"].unique() if t != "purchase")
        tbit = {t: 1 << i for i, t in enumerate(types)}
        k = len(types)
        per = ev.groupby("user_id").agg(
            mask=("event_type", lambda s: sum({tbit.get(t, 0) for t in s})),
            conv=("event_type", lambda s: int("purchase" in set(s))),
        )
        cnt = np.zeros(1 << k, np.int64)
        for m, c in per[per["conv"] == 1]["mask"].value_counts().items():
            for S in range(1 << k):
                if (int(m) & S) == int(m):
                    cnt[S] += c
        return types, k, cnt, len(per)

    def test_matches_permutation_definition(self, ray_session, sf_tiny):
        """Shapley via the subset formula must equal the average
        marginal contribution over all k! permutations — the defining
        identity, checked with the actual coalition values."""
        from searchengine_ray.pipelines.queries import q_shapley_attrib

        types, k, cnt, n_users = self._direct(sf_tiny)
        got = q_shapley_attrib(sf_tiny).set_index("channel")
        kfact = math.factorial(k)
        for ci, ch in enumerate(types):
            bit = 1 << ci
            total = 0
            for perm in itertools.permutations(range(k)):
                S = 0
                for p in perm:
                    if p == ci:
                        total += int(cnt[S | bit]) - int(cnt[S])
                        break
                    S |= 1 << p
            assert got.loc[ch, "phi_scaled"] == total, ch
            assert abs(got.loc[ch, "phi"] - round(total / (kfact * n_users), 6)) < 1e-9

    def test_efficiency_identity(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_shapley_attrib

        got = q_shapley_attrib(sf_tiny)
        k = len(got)
        kfact = math.factorial(k)
        assert (
            got["phi_scaled"].sum()
            == kfact * (got["n_converted_all"].iloc[0] - got["baseline_conv"].iloc[0])
        )


class TestSimrankPairs:
    def test_matches_textbook_iteration(self, ray_session, sf_tiny):
        """Independent pairwise-sum SimRank (no matrix algebra) must
        produce the same top pairs."""
        from searchengine_ray.pipelines.queries import (
            SIMRANK_C,
            SIMRANK_ITERS,
            SIMRANK_N,
            _doc_graph_edges,
            q_simrank_pairs,
            round_half_away,
        )

        edges, n = _doc_graph_edges(sf_tiny)
        m = min(SIMRANK_N, n)
        keep = (edges[:, 0] != edges[:, 1]) & (edges[:, 0] < m) & (edges[:, 1] < m)
        pairs = sorted({(int(a), int(b)) for a, b in edges[keep]})
        inn = [[] for _ in range(m)]
        for a, b in pairs:
            inn[b].append(a)
        S = np.eye(m)
        for _ in range(SIMRANK_ITERS):
            S2 = np.zeros((m, m))
            for a in range(m):
                for b in range(m):
                    if a == b:
                        S2[a, b] = 1.0
                    elif inn[a] and inn[b]:
                        acc = 0.0
                        for i in inn[a]:
                            for j in inn[b]:
                                acc += S[i, j]
                        S2[a, b] = SIMRANK_C * acc / (len(inn[a]) * len(inn[b]))
            S = round_half_away(S2, 10)
        got = q_simrank_pairs(sf_tiny)
        for r in got.itertuples():
            assert abs(r.simrank - round_half_away(S[r.node_a, r.node_b], 6)) < 1e-9

    def test_fixed_point_properties(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SIMRANK_C, q_simrank_pairs

        got = q_simrank_pairs(sf_tiny)
        # scores bounded by C (off-diagonal SimRank ≤ C)
        assert (got["simrank"] <= SIMRANK_C + 1e-9).all()
        assert (got["simrank"] >= 0).all()
        assert (got["node_a"] < got["node_b"]).all()
        # ordering is by score desc
        s = got["simrank"].to_numpy()
        assert (np.diff(s) <= 1e-12).all()
