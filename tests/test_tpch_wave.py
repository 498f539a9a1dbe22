"""TPC-H registry wave: each kept Ray pipeline vs its own DuckDB
oracle at sf0.001 — the same contract the driver's correctness gate
enforces at sf0.01, kept in the suite so a refactor that breaks the
join/aggregation patterns fails fast."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

TABLES = "region nation customer supplier part orders lineitem".split()

WAVE = ["tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q18", "custdist"]


def _oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("datetime"):
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


