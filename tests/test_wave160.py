"""Wave 160: weekly LTV cohorts + exact Bayesian A/B — vs direct
pandas / closed-form-vs-simulation-free recomputation."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

WEEK_US = 604_800_000_000


class TestLtvCohorts:
    def test_matches_pandas(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ltv_cohorts

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        ev["a"] = ev["ts"].astype("int64")
        first = ev.groupby("user_id")["a"].min() // WEEK_US
        sizes = first.value_counts()
        p = ev[ev["event_type"] == "purchase"].copy()
        p["cohort"] = p["user_id"].map(first).astype(np.int64)
        p["age"] = p["a"] // WEEK_US - p["cohort"]
        p["rev"] = np.rint(p["value"].to_numpy() * 1e6).astype(np.int64)
        want = (
            p.groupby(["cohort", "age"])["rev"].sum().reset_index().sort_values(
                ["cohort", "age"]
            )
        )
        want["cum"] = want.groupby("cohort")["rev"].cumsum()
        got = q_ltv_cohorts(sf_tiny)
        assert len(got) == len(want)
        for (r, w) in zip(got.itertuples(), want.itertuples()):
            assert (r.cohort, r.age) == (w.cohort, w.age)
            assert r.revenue_micro == w.rev
            assert r.cum_revenue_micro == w.cum
            assert r.n_users == sizes[w.cohort]
            assert r.ltv_micro_per_user == w.cum // sizes[w.cohort]

    def test_curve_monotone(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ltv_cohorts

        got = q_ltv_cohorts(sf_tiny)
        for _, g in got.groupby("cohort"):
            c = g.sort_values("age")["cum_revenue_micro"].to_numpy()
            assert (np.diff(c) >= 0).all()
            a = g.sort_values("age")["age"].to_numpy()
            assert (a >= 0).all()


class TestBayesAb:
    def test_matches_direct_formula(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bayes_ab

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["user_id", "event_type"])
        conv = ev.assign(c=(ev["event_type"] == "purchase").astype(int)).groupby(
            "user_id"
        )["c"].max()
        arm = conv.index.to_numpy(np.int64) % 2
        na, xa = int((arm == 0).sum()), int(conv.to_numpy()[arm == 0].sum())
        nb, xb = int((arm == 1).sum()), int(conv.to_numpy()[arm == 1].sum())
        got = q_bayes_ab(sf_tiny).set_index("arm")
        assert got.loc["A", "users"] == na and got.loc["A", "conversions"] == xa
        assert got.loc["B", "users"] == nb and got.loc["B", "conversions"] == xb

        def lbeta(x, y):
            return math.lgamma(x) - math.lgamma(x + y) + math.lgamma(y)

        aa, ba, ab, bb = xa + 1, na - xa + 1, xb + 1, nb - xb + 1
        p = sum(
            math.exp(lbeta(aa + i, ba + bb) - math.log(bb + i) - lbeta(1 + i, bb)
                     - lbeta(aa, ba))
            for i in range(ab)
        )
        assert abs(got["prob_b_beats_a"].iloc[0] - p) < 1e-5

    def test_symmetry(self, ray_session, sf_tiny):
        """P(B>A) + P(A>B) = 1 (continuous posteriors): recompute the
        mirrored sum and check the complement."""
        from searchengine_ray.pipelines.queries import q_bayes_ab

        got = q_bayes_ab(sf_tiny).set_index("arm")
        na, xa = int(got.loc["A", "users"]), int(got.loc["A", "conversions"])
        nb, xb = int(got.loc["B", "users"]), int(got.loc["B", "conversions"])

        def lbeta(x, y):
            return math.lgamma(x) - math.lgamma(x + y) + math.lgamma(y)

        aa, ba, ab, bb = xa + 1, na - xa + 1, xb + 1, nb - xb + 1
        p_a_beats_b = sum(
            math.exp(lbeta(ab + i, bb + ba) - math.log(ba + i) - lbeta(1 + i, ba)
                     - lbeta(ab, bb))
            for i in range(aa)
        )
        assert abs(got["prob_b_beats_a"].iloc[0] + p_a_beats_b - 1.0) < 1e-5
        assert 0.0 <= got["prob_b_beats_a"].iloc[0] <= 1.0
