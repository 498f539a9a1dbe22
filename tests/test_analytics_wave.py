"""Analytics wave: windowed distinct (WAU), Markov transitions, Gini,
Benford, entropy, association rules, BFS hops — brute-force / invariant
checks complementing the DuckDB gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestBfsHops:
    def test_dense_matches_dataset_path(self, ray_session):
        from searchengine_ray.functions.graph import bfs_hops

        n = 400
        ids = np.arange(n, dtype=np.int64)
        edges = np.concatenate(
            [
                np.stack([ids, (ids * ids + 3) % n], axis=1),
                np.stack([ids, (ids * 13 + 17) % n], axis=1),
            ]
        )
        dense = bfs_hops(edges, n, seed=0, max_iter=20)
        dist = bfs_hops(edges, n, seed=0, max_iter=20, dense_gate=0)
        pd.testing.assert_frame_equal(dense, dist)

    def test_disconnected_component_absent(self, ray_session):
        from searchengine_ray.functions.graph import bfs_hops

        # two separate paths: 0-1-2 and 3-4
        edges = np.array([[0, 1], [1, 2], [3, 4]])
        out = bfs_hops(edges, 5, seed=0)
        assert out["node"].tolist() == [0, 1, 2]
        assert out["dist"].tolist() == [0, 1, 2]

    def test_nonconvergence_raises(self, ray_session):
        from searchengine_ray.functions.graph import bfs_hops

        edges = np.stack([np.arange(9), np.arange(1, 10)], axis=1)
        with pytest.raises(RuntimeError):
            bfs_hops(edges, 10, seed=0, max_iter=3)


class TestWauDaily:
    def test_brute_force(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_wau_daily

        out = q_wau_daily(sf_tiny)
        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "user_id"])
        ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
        days = sorted(ev["day"].unique())
        expect = {
            d: ev[(ev["day"] >= d - 6) & (ev["day"] <= d)]["user_id"].nunique()
            for d in days
        }
        got = dict(zip(out["day"], out["wau"]))
        assert got == expect


class TestGini:
    def test_uniform_is_zeroish(self, ray_session):
        # equal values -> G = (n-1)/n * 0 exactly via the rank formula
        x = np.full(10, 7, np.int64)
        r = np.arange(1, 11)
        g = (2.0 * (r * x).sum()) / (10 * x.sum()) - 11.0 / 10
        assert abs(g) < 1e-12

    def test_registry_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_gini_revenue

        out = q_gini_revenue(sf_tiny)
        assert ((out["gini"] >= 0) & (out["gini"] < 1)).all()
        assert (out["n_suppliers"] >= 1).all()


class TestMarkov:
    def test_rows_sum_to_one(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_markov_transitions

        out = q_markov_transitions(sf_tiny)
        sums = out.groupby("from_type")["prob"].sum()
        assert ((sums - 1.0).abs() < 1e-4).all()

    def test_counts_match_pandas(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_markov_transitions

        out = q_markov_transitions(sf_tiny)
        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        nxt = ev.groupby("user_id")["event_type"].shift(-1)
        expect = (
            pd.DataFrame({"f": ev["event_type"], "t": nxt})
            .dropna()
            .groupby(["f", "t"])
            .size()
        )
        got = out.set_index(["from_type", "to_type"])["n"]
        assert got.to_dict() == expect.to_dict()


class TestBenford:
    def test_shares_sum_to_one(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_benford_digits

        out = q_benford_digits(sf_tiny)
        assert set(out["digit"]).issubset(set(range(1, 10)))
        assert abs(out["share"].sum() - 1.0) < 1e-4


class TestEntropy:
    def test_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_daily_entropy

        out = q_daily_entropy(sf_tiny)
        assert (out["entropy"] >= 0).all()
        assert (out["entropy"] <= np.log(5) + 1e-9).all()


class TestAssocRules:
    def test_confidence_lift_consistency(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_assoc_rules

        out = q_assoc_rules(sf_tiny)
        assert ((out["confidence"] > 0) & (out["confidence"] <= 1)).all()
        assert (out["lift"] > 0).all()
        # directed: every rule's mirror exists with the same pair count
        fwd = out.set_index(["ante", "cons"])["n_pair"]
        rev = out.set_index(["cons", "ante"])["n_pair"]
        rev.index = rev.index.set_names(["ante", "cons"])
        assert fwd.sort_index().equals(rev.sort_index())
