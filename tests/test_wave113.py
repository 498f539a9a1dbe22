"""Brute-force identity tests for the join wave (sort-merge join +
salted skew join, registry 423-424)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestSortMergeJoin:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_sortmerge_join

        li = pd.read_parquet(
            f"{sf_tiny}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_returnflag"],
        )
        od = pd.read_parquet(
            f"{sf_tiny}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
        )
        j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
        cents = np.round(np.round(j["l_extendedprice"], 2) * 100.0).astype(np.int64)
        exp = (
            pd.DataFrame(
                {
                    "l_returnflag": j["l_returnflag"],
                    "o_orderpriority": j["o_orderpriority"],
                    "cents": cents,
                }
            )
            .groupby(["l_returnflag", "o_orderpriority"], as_index=False)
            .agg(n_rows=("cents", "size"), revenue_cents=("cents", "sum"))
            .sort_values(["l_returnflag", "o_orderpriority"])
            .reset_index(drop=True)
        )
        got = q_sortmerge_join(sf_tiny)
        pd.testing.assert_frame_equal(
            got, exp.astype({"n_rows": "int64", "revenue_cents": "int64"})
        )

    def test_every_lineitem_joins(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_sortmerge_join

        li = pd.read_parquet(f"{sf_tiny}/lineitem.parquet", columns=["l_orderkey"])
        got = q_sortmerge_join(sf_tiny)
        # referential integrity in the synthetic data: inner join keeps
        # every lineitem row
        assert int(got["n_rows"].sum()) == len(li)


def _expected_salted(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    day = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    df = pd.DataFrame({"user_id": ev["user_id"], "day": day})
    first = df.groupby("user_id")["day"].transform("min")
    week = (df["day"] - first) // 7
    exp = (
        week.value_counts()
        .rename_axis("week")
        .reset_index(name="n_events")
        .sort_values("week")
        .reset_index(drop=True)
    )
    return exp.astype({"week": "int64", "n_events": "int64"})


class TestSaltedJoin:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_salted_join

        pd.testing.assert_frame_equal(q_salted_join(sf_tiny), _expected_salted(sf_tiny))

    def test_salting_is_semantics_free(self, ray_session, sf_tiny, monkeypatch):
        """Forcing EVERY key hot (factor 0) must not change the join
        result — the salted plan is a pure physical rewrite."""
        import searchengine_ray.pipelines.queries as Q

        monkeypatch.setattr(Q, "SALT_HOT_FACTOR", 0.0)
        pd.testing.assert_frame_equal(
            Q.q_salted_join(sf_tiny), _expected_salted(sf_tiny)
        )
