"""Wave 176: KNN-Shapley + secretary rule — vs brute-force subset
utilities / sequential replay."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd


class TestKnnShapley:
    def test_matches_exhaustive_shapley_small(self, ray_session):
        """On a 6-point synthetic train set, the closed-form recurrence
        must equal Shapley computed by exhaustive subset enumeration of
        the KNN utility."""
        from searchengine_ray.pipelines.queries import KSH_K

        rng = np.random.RandomState(3)
        Xtr = rng.randn(6, 4)
        ytr = np.array([0, 1, 0, 1, 1, 0])
        xt, yt = rng.randn(4), 1
        d = ((Xtr - xt) ** 2).sum(axis=1)
        order = np.argsort(d)
        eq = (ytr[order] == yt).astype(float)
        N = len(eq)
        K = KSH_K

        def u(subset):
            # subset: indices into the SORTED order; utility = share of
            # matching labels among the min(K, |S|) nearest in S
            if not subset:
                return 0.0
            sub = sorted(subset)
            top = sub[: min(K, len(sub))]
            return sum(eq[i] for i in top) / K

        # exhaustive Shapley over the 6 sorted points
        import math as m

        shap = np.zeros(N)
        idx = list(range(N))
        for perm in itertools.permutations(idx):
            S = []
            for p in perm:
                before = u(S)
                S.append(p)
                shap[p] += u(S) - before
        shap /= m.factorial(N)
        # closed form
        s = np.zeros(N)
        s[N - 1] = eq[N - 1] / N
        for i in range(N - 2, -1, -1):
            j = i + 1
            s[i] = s[i + 1] + ((eq[i] - eq[i + 1]) / K) * (min(K, j) / j)
        assert np.allclose(s, shap, atol=1e-12)

    def test_entry_efficiency_and_order(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_knn_shapley

        got = q_knn_shapley(sf_tiny)
        for _, g in got.groupby("test_id"):
            g = g.sort_values("rank")
            v = g["shapley_micro"].to_numpy()
            assert (np.diff(v) <= 0).all()
            # the most valuable point is (weakly) positive when u>0
            if g["ufull_micro"].iloc[0] > 0:
                assert v[0] > 0


class TestSecretaryRule:
    def test_matches_sequential_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_secretary_rule

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        p = ev[ev["event_type"] == "purchase"].copy()
        p["v"] = np.rint(p["value"].to_numpy() * 100).astype(np.int64)
        p["a"] = p["ts"].astype("int64")
        want = {}
        for uid, g in p.groupby("user_id"):
            g = g.sort_values(["a", "event_id"])
            v = g["v"].to_numpy(np.int64)
            n = len(v)
            if n < 3:
                continue
            r = int(n / math.e)
            obsmax = int(v[:r].max())
            acc = None
            for k in range(r, n):
                if int(v[k]) > obsmax:
                    acc = int(v[k])
                    break
            if acc is None:
                acc = int(v[-1])
            st, su = want.get(n, (0, 0))
            want[n] = (st + 1, su + int(acc == int(v.max())))
        got = q_secretary_rule(sf_tiny)
        assert dict(zip(got["n"], zip(got["n_streams"], got["n_success"]))) == want

    def test_rate_beats_random_pick(self, ray_session, sf_small):
        """The 1/e rule must beat the pick-uniformly-at-random baseline
        E[success] = Σ streams/n on aggregate (the whole point)."""
        from searchengine_ray.pipelines.queries import q_secretary_rule

        got = q_secretary_rule(sf_small)
        rate = got["overall_rate_micro"].iloc[0] / 1e6
        random_baseline = (
            (got["n_streams"] / got["n"]).sum() / got["n_streams"].sum()
        )
        assert rate > random_baseline
