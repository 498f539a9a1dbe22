"""Property tests for the round-5 Arrow-native bucket reducers.

Each converted reducer is compared against a straightforward pandas
reference implementation on randomized inputs — the conversions claimed
"identical accumulation order", so these tests pin that claim down
beyond the fixed oracle datasets (seeded; no flaky randomness)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _events(rng, n_users=40, n_rows=800):
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n_rows).astype(np.int64),
            "ts": rng.integers(0, 10_000_000_000, n_rows).astype(np.int64),
            "value": np.round(rng.normal(50, 20, n_rows), 2),
            "event_id": np.arange(n_rows, dtype=np.int64),
        }
    )


@pytest.fixture(scope="module")
def df():
    return _events(np.random.default_rng(7))


def _to_ds(df):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "event_id": pa.array(df["event_id"], pa.int64()),
            "ts": pa.array(df["ts"], pa.timestamp("us")),
            "user_id": pa.array(df["user_id"], pa.int64()),
            "value": pa.array(df["value"], pa.float64()),
        }
    )
    return rd.from_arrow(t)


def test_running_total_matches_pandas(ray_session, df):
    from searchengine_ray.functions.windows import running_total

    got = (
        running_total(_to_ds(df), "user_id", "ts", "value", "event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ref = ref.assign(running=ref.groupby("user_id")["value"].cumsum().round(4))
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert np.array_equal(got["running"].to_numpy(), ref["running"].to_numpy())


def test_lag_delta_matches_pandas(ray_session, df):
    from searchengine_ray.functions.windows import lag_delta

    got = (
        lag_delta(_to_ds(df), "user_id", "ts", "value", "event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    prev = ref.groupby("user_id")["value"].shift(1)
    ref = ref.assign(prev=prev.round(4), delta=(ref["value"] - prev).round(4))
    ref = ref.sort_values("event_id").reset_index(drop=True)
    for col in ("prev", "delta"):
        g, r = got[col].to_numpy(), ref[col].to_numpy()
        assert np.array_equal(np.isnan(g), np.isnan(r))
        assert np.array_equal(g[~np.isnan(g)], r[~np.isnan(r)])


def test_sessionize_matches_pandas(ray_session, df):
    from searchengine_ray.functions.windows import sessionize

    gap = 100_000_000
    got = (
        sessionize(_to_ds(df), "user_id", "ts", "value", gap, id_col="event_id")
        .to_pandas()
        .sort_values(["user_id", "session"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(
        drop=True
    )
    brk = (ref["user_id"].ne(ref["user_id"].shift())) | (
        ref["ts"].diff().gt(gap)
    )
    ref = ref.assign(_g=brk.cumsum())
    agg = (
        ref.groupby("_g", sort=True)
        .agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("value", "size"),
            sum_value=("value", "sum"),
        )
        .reset_index(drop=True)
    )
    agg["session"] = agg.groupby("user_id").cumcount() + 1
    agg = agg.sort_values(["user_id", "session"]).reset_index(drop=True)
    assert np.array_equal(got["user_id"].to_numpy(), agg["user_id"].to_numpy())
    assert np.array_equal(got["session"].to_numpy(), agg["session"].to_numpy())
    assert np.array_equal(
        got["session_start"].to_numpy(), agg["session_start"].to_numpy()
    )
    assert np.array_equal(got["n_events"].to_numpy(), agg["n_events"].to_numpy())
    assert np.allclose(got["sum_value"].to_numpy(), agg["sum_value"].to_numpy())


def test_first_last_matches_pandas(ray_session, df):
    from searchengine_ray.functions.windows import first_last_by_key

    got = (
        first_last_by_key(_to_ds(df), "user_id", "ts", "event_id", ["value"])
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    first = ref.drop_duplicates("user_id", keep="first").set_index("user_id")["value"]
    last = ref.drop_duplicates("user_id", keep="last").set_index("user_id")["value"]
    keys = np.sort(df["user_id"].unique())
    assert np.array_equal(got["user_id"].to_numpy(), keys)
    assert np.array_equal(got["first_value"].to_numpy(), first.loc[keys].to_numpy())
    assert np.array_equal(got["last_value"].to_numpy(), last.loc[keys].to_numpy())


def test_group_topk_matches_pandas_strings(ray_session):
    """String group keys exercise the Table.sort_by generic-type path."""
    import ray.data as rd

    from searchengine_ray.functions.sampling import group_topk

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "grp": rng.choice(list("abcdefg"), 300),
            "score": np.round(rng.random(300), 6),
            "id": np.arange(300, dtype=np.int64),
        }
    )
    got = (
        group_topk(rd.from_pandas(df), "grp", "score", "id", k=5)
        .to_pandas()
        .sort_values(["grp", "rank"])
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values(["grp", "score", "id"], ascending=[True, False, True])
        .groupby("grp")
        .head(5)
        .reset_index(drop=True)
    )
    assert len(got) == len(ref)
    assert np.array_equal(got["id"].to_numpy(), ref["id"].to_numpy())
    per_group = got.groupby("grp")["rank"].apply(list)
    assert all(r == list(range(1, len(r) + 1)) for r in per_group)
