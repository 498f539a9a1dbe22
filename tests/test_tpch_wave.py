"""TPC-H completion wave (q2/q9/q11/q12/q16/q20/q21): each Ray pipeline
vs its own DuckDB oracle at sf0.001 — the same contract the driver's
correctness gate enforces at sf0.01, kept in the suite so a refactor
that breaks the decorrelation patterns (scalar threshold, per-group
min join-back, exists/not-exists blame aggregation) fails fast."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

TABLES = "region nation customer supplier part orders lineitem".split()

WAVE = ["tpch_q2", "tpch_q9", "tpch_q11", "tpch_q12", "tpch_q16", "tpch_q20", "tpch_q21"]


def _oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE)
def test_matches_duckdb(ray_session, sf_tiny, name):
    from searchengine_ray.pipelines.queries import registry

    fn, sql = registry()[name]
    ray_df = fn(sf_tiny)
    ora_df = _oracle(sql, sf_tiny)
    assert list(sorted(ray_df.columns)) == list(sorted(ora_df.columns))
    assert len(ray_df) == len(ora_df), (len(ray_df), len(ora_df))
    pd.testing.assert_frame_equal(_norm(ray_df), _norm(ora_df), check_dtype=False)


def test_q21_blames_unique_late_supplier(ray_session, sf_tiny):
    """Structural invariant: every blamed order has >=2 suppliers and
    exactly one late one — numwait can never exceed the count of
    F-status orders."""
    import duckdb

    from searchengine_ray.pipelines.queries import q_tpch_q21

    out = q_tpch_q21(sf_tiny)
    con = duckdb.connect()
    n_f = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_tiny}/orders.parquet') "
        "WHERE o_orderstatus='F'"
    ).fetchone()[0]
    assert (out["numwait"] > 0).all()
    assert out["numwait"].sum() <= n_f
