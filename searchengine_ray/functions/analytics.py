"""Product-analytics aggregates over event streams: retention cohorts,
CUBE (grouping-sets) aggregation, and pivot (crosstab) — the wide-table
counterparts to the windowed operators in ``windows.py``.

All three follow the same scale discipline: per-batch partial
aggregation (combiner) compresses rows BEFORE the shuffle, grouping keys
are low-cardinality or user-bounded, and nothing corpus-sized reaches
the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_US_PER_DAY = 86_400_000_000


def _epoch_days(ts_col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp[us] → int64 days since epoch (UTC calendar date)."""
    us = ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return us // _US_PER_DAY


# --------------------------------------------------------------- retention


def retention_cohorts(events_ds, ts_column: str = "ts", user_column: str = "user_id") -> pd.DataFrame:
    """Classic retention triangle: cohort = a user's first active day;
    cell (cohort_day, day_offset) = distinct users from that cohort
    active offset days later.

    Plan: one user-hash-bucket groupby co-locates each user's (day)
    rows; inside a bucket a lexsort + run segmentation computes every
    user's cohort (min day) and the DISTINCT (cohort, offset, user)
    triples vectorized — a user lives in exactly one bucket, so
    bucket-local dedup IS global dedup; then one vocabulary-small
    groupby counts users per (cohort_day, day_offset). Two shuffles,
    no join (this Ray version's hash join crashes on the schema-less
    empty partitions a small input produces). Returns
    (cohort_day, day_offset, n_users), ints."""
    from ray.data.aggregate import Count

    def to_days(b: pa.Table) -> pa.Table:
        u = b[user_column].cast(pa.int64())
        un = u.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": u,
                "day": pa.array(_epoch_days(b[ts_column]), pa.int64()),
                "bucket": pa.array(
                    (un.astype(np.uint64) * np.uint64(2654435761) >> np.uint64(52)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        new_user = np.empty(len(u), bool)
        new_user[:1] = True
        new_user[1:] = u[1:] != u[:-1]
        run_id = np.cumsum(new_user) - 1
        cohort = d[new_user][run_id]  # per-row cohort = first (=min) day of the run
        off = d - cohort
        keep = np.empty(len(u), bool)  # distinct (user, offset): sorted, so adjacent-dedup
        keep[:1] = True
        keep[1:] = (u[1:] != u[:-1]) | (off[1:] != off[:-1])
        return pa.table(
            {
                "cohort_day": pa.array(cohort[keep], pa.int64()),
                "day_offset": pa.array(off[keep], pa.int64()),
            }
        )

    out = (
        events_ds.map_batches(to_days, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    return out.astype({"cohort_day": "int64", "day_offset": "int64", "n_users": "int64"})


# -------------------------------------------------------------------- cube


CUBE_ALL = "ALL"  # margin sentinel for the string dimension
CUBE_ALL_DAY = -1  # margin sentinel for the day dimension


def cube_events(events_ds, type_column: str = "event_type",
                ts_column: str = "ts", value_column: str = "value") -> pd.DataFrame:
    """CUBE(event_type, day): all four grouping sets in ONE pass — each
    batch emits its partial (n, sum) for every grouping set with margin
    sentinels, so one vocabulary-tiny shuffle serves the whole lattice
    (vs 4 separate groupbys = 4 scans + 4 shuffles)."""
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        et = b[type_column].to_pandas()
        day = pd.Series(_epoch_days(b[ts_column]))
        val = b[value_column].to_pandas()
        df = pd.DataFrame({"event_type": et, "day": day, "v": val})
        outs = []
        for keys, sub in (
            (["event_type", "day"], None),
            (["event_type"], ("day", CUBE_ALL_DAY)),
            (["day"], ("event_type", CUBE_ALL)),
            ([], None),
        ):
            if keys:
                g = df.groupby(keys, as_index=False).agg(n=("v", "size"), s=("v", "sum"))
            else:
                g = pd.DataFrame(
                    {"n": [len(df)], "s": [df["v"].sum()]}
                )
            if "event_type" not in g.columns:
                g["event_type"] = CUBE_ALL
            if "day" not in g.columns:
                g["day"] = CUBE_ALL_DAY
            outs.append(g[["event_type", "day", "n", "s"]])
        allg = pd.concat(outs, ignore_index=True)
        return pa.table(
            {
                "event_type": pa.array(allg["event_type"].astype(str), pa.string()),
                "day": pa.array(allg["day"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(allg["n"].to_numpy(np.int64), pa.int64()),
                "s": pa.array(allg["s"].to_numpy(np.float64), pa.float64()),
            }
        )

    out = (
        events_ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("s", alias_name="sum_value"))
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    out["sum_value"] = out["sum_value"].round(4)
    return out.astype({"event_type": "object", "day": "int64", "n_events": "int64"})


# ------------------------------------------------------------------- pivot


def pivot_user_events(events_ds, categories: list[str],
                      user_column: str = "user_id",
                      type_column: str = "event_type") -> pd.DataFrame:
    """Crosstab: one row per user, one count column per event type (the
    fixed ``categories`` list defines the schema — unknown types raise).
    Per-batch crosstab partials → groupby(user).sum over the fixed
    columns; the shuffle carries ≤|users|·|batches| rows, already
    type-collapsed."""
    from ray.data.aggregate import Sum

    cats = list(categories)

    def partial(b: pa.Table) -> pa.Table:
        u = b[user_column].to_numpy(zero_copy_only=False)
        t = b[type_column].to_pandas()
        unknown = set(t.unique()) - set(cats)
        if unknown:
            raise ValueError(f"event types outside pivot schema: {sorted(unknown)}")
        ct = pd.crosstab(pd.Series(u, name="user_id"), t)
        ct = ct.reindex(columns=cats, fill_value=0).reset_index()
        cols = {"user_id": pa.array(ct["user_id"].to_numpy(np.int64), pa.int64())}
        for c in cats:
            cols[c] = pa.array(ct[c].to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    aggs = [Sum(c, alias_name=c) for c in cats]
    out = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*aggs)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out.astype({c: "int64" for c in ["user_id", *cats]})
