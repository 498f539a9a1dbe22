"""Event-time pipelines: windows, sessions, funnels, retention, sketches.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS
from ._common import round_half_away  # noqa: F401


def q_distinct_segments(sf_dir: str) -> pd.DataFrame:
    """D-ops: Dataset.unique (distinct shuffle)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": pd.Series(vals, dtype="object")})

def sql_distinct_segments() -> str:
    return "SELECT DISTINCT c_mktsegment FROM customer"

def q_asof_join(sf_dir: str) -> pd.DataFrame:
    """As-of join (custom operator): each click event picks up the most
    recent prior view event of the same user — hash-bucket co-partition,
    one shuffle, per-bucket ``merge_asof``. Oracle: DuckDB native
    ``ASOF JOIN``."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.joins import asof_join

    cols = ["event_id", "ts", "user_id", "value"]
    clicks = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=pc.field("event_type") == "click",
    )
    views = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=pc.field("event_type") == "view",
    )
    out = asof_join(
        clicks, views, on="ts", by="user_id",
        left_cols=["event_id"], right_cols=["event_id", "value"],
    ).to_pandas()
    out = out.rename(
        columns={"event_id": "click_id", "event_id_r": "view_id", "value_r": "view_value"}
    )[["click_id", "user_id", "view_id", "view_value"]]
    out = out.astype({"click_id": "int64", "user_id": "int64", "view_id": "int64"})
    return out.sort_values("click_id").reset_index(drop=True)

def sql_asof_join() -> str:
    return """
SELECT a.event_id AS click_id, a.user_id AS user_id,
       b.event_id AS view_id, b.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
ORDER BY click_id
"""

def q_events_window(sf_dir: str) -> pd.DataFrame:
    """Stream-shaped: tumbling 1h window count+sum per event_type
    (groupby over a derived window key — ray_guide streaming section)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def add_window(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        epoch = pc.cast(batch["ts"], pa.int64())  # microseconds
        win = pc.divide(epoch, 3_600_000_000)
        return batch.append_column("window", pc.cast(win, pa.int64()))

    out = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["window", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(6)
    return out.astype({"window": "int64", "n_events": "int64"})

def sql_events_window() -> str:
    return """
SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS window, event_type,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""

def q_sliding_window(sf_dir: str) -> pd.DataFrame:
    """Hopping window aggregate: 1h windows every 15min over events
    (each event in size/hop = 4 windows; vectorized replication →
    one groupby shuffle)."""
    import ray.data as rd

    from searchengine_ray.functions.windows import sliding_window_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    out = sliding_window_agg(
        ds, ts_col="ts", keys=["event_type"], value_col="value",
        size_us=3_600_000_000, hop_us=900_000_000,
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(6)
    return out.astype({"window": "int64", "n_events": "int64"})

def sql_sliding_window() -> str:
    return """
SELECT CAST(floor(epoch_us(ts) / 900000000) - t.j AS BIGINT) AS window,
       event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events, range(0, 4) t(j)
GROUP BY 1, 2
"""

def q_sessionize(sf_dir: str) -> pd.DataFrame:
    """Session windows: per-user gap-based sessions (gap 30min) —
    key-hash bucket shuffle + vectorized gaps-and-islands."""
    import ray.data as rd

    from searchengine_ray.functions.windows import sessionize

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    out = sessionize(
        ds, user_col="user_id", ts_col="ts", value_col="value",
        gap_us=1_800_000_000, id_col="event_id",
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(6)
    return out.astype(
        {"user_id": "int64", "session": "int64", "session_start": "int64", "n_events": "int64"}
    )

def sql_sessionize() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events
), b AS (
  SELECT *, CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS session
  FROM b
)
SELECT user_id, CAST(session AS BIGINT) AS session, min(t) AS session_start,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM s GROUP BY 1, 2
"""

def q_range_join(sf_dir: str) -> pd.DataFrame:
    """Interval range join (non-equi): every event within 10 minutes
    after an 'error' event — time-bucket co-partition, one shuffle,
    per-bucket searchsorted slices."""
    import pyarrow as pa
    import ray.data as rd

    from searchengine_ray.functions.joins import range_join

    win_us = 600_000_000
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"])

    def to_intervals(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.equal(b["event_type"], "error")
        b = b.filter(mask)
        start = b["ts"].cast(pa.int64())
        return pa.table(
            {
                "anchor_id": b["event_id"],
                "w_start": start,
                "w_end": pc.add(start, win_us),
            }
        )

    anchors = ev.map_batches(to_intervals, batch_format="pyarrow")
    out = range_join(
        ev, anchors,
        left_ts="ts", right_start="w_start", right_end="w_end",
        left_cols=["event_id", "event_type"], right_cols=["anchor_id"],
        # bucket ≥ interval keeps replication ≤ 2×; 1h buckets (vs the
        # 10min window) trade a little replication skew for 6× fewer
        # shuffle groups
        bucket_us=6 * win_us, suffix="",
    ).to_pandas()
    out = out[out["event_id"] != out["anchor_id"]].reset_index(drop=True)
    return out[["anchor_id", "event_id", "event_type"]].astype(
        {"anchor_id": "int64", "event_id": "int64"}
    )

def sql_range_join() -> str:
    return """
SELECT a.event_id AS anchor_id, e.event_id AS event_id, e.event_type AS event_type
FROM events a JOIN events e
  ON epoch_us(e.ts) >= epoch_us(a.ts)
 AND epoch_us(e.ts) < epoch_us(a.ts) + 600000000
WHERE a.event_type = 'error' AND e.event_id <> a.event_id
"""

def q_event_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-group quantiles (DuckDB quantile_disc semantics) via a
    value-domain count shuffle — no global sort, nothing row-sized on
    the driver."""
    import ray.data as rd

    from searchengine_ray.functions.quantiles import grouped_quantiles

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    out = grouped_quantiles(ev, "event_type", "value", [0.25, 0.5, 0.9], quantize=3)
    return out.astype({"q": "float64", "value": "float64"})

def sql_event_quantiles() -> str:
    return """
WITH s AS (
  SELECT event_type,
         quantile_disc(round(value, 3), [0.25, 0.5, 0.9]) AS vs
  FROM events GROUP BY event_type
)
SELECT event_type, unnest([0.25, 0.5, 0.9]) AS q, unnest(vs) AS value FROM s
"""

def q_running_total(sf_dir: str) -> pd.DataFrame:
    """Per-user cumulative spend over events in (ts, event_id) order —
    one key-hash bucket shuffle + vectorized per-bucket scan."""
    import ray.data as rd

    from ..functions.windows import running_total

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    out = running_total(ds, "user_id", "ts", "value", "event_id").to_pandas()
    return out.astype({"event_id": "int64", "user_id": "int64"})

def sql_running_total() -> str:
    return """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS running
FROM events
"""

def q_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered funnel analysis (view → click → purchase, strictly
    later events per step): per-bucket vectorized greedy matching, one
    partial-count row per bucket, summed into a single result row."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.windows import funnel_counts

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    parts = funnel_counts(ds, "user_id", "ts", "event_type", "event_id")
    agg = parts.aggregate(
        Sum("n_step1", alias_name="n_view"),
        Sum("n_step2", alias_name="n_view_click"),
        Sum("n_step3", alias_name="n_full"),
    )
    return pd.DataFrame(
        {k: pd.Series([int(agg[k] or 0)], dtype="int64")
         for k in ("n_view", "n_view_click", "n_full")}
    )

def sql_funnel() -> str:
    # greedy funnel via per-user event ranks: earliest view, earliest
    # click strictly after it, earliest purchase strictly after that
    return """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
v AS (SELECT user_id, min(rn) AS r1 FROM r WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT r.user_id, min(rn) AS r2 FROM r JOIN v USING (user_id)
      WHERE event_type = 'click' AND rn > v.r1 GROUP BY 1),
p AS (SELECT r.user_id, min(rn) AS r3 FROM r JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND rn > c.r2 GROUP BY 1)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_full
"""

def q_lag_delta(sf_dir: str) -> pd.DataFrame:
    """Per-user LAG window: previous value + delta in (ts, event_id)
    order — key-hash bucket shuffle + vectorized per-bucket shift."""
    import ray.data as rd

    from ..functions.windows import lag_delta

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    out = lag_delta(ds, "user_id", "ts", "value", "event_id").to_pandas()
    return out.astype({"event_id": "int64", "user_id": "int64"})

def sql_lag_delta() -> str:
    return """
SELECT event_id, user_id,
       round(lag(value) OVER w, 4) AS prev,
       round(value - lag(value) OVER w, 4) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

def q_rollup_counts(sf_dir: str) -> pd.DataFrame:
    """ROLLUP-style multi-level aggregation: doc counts + char sums at
    (lang, source), (lang) and grand-total levels. The finest level is
    ONE distributed groupby; coarser levels derive from its (tiny)
    result on the driver — no second pass over the data."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    fine = (
        ds.groupby(["lang", "source"])
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="chars"))
        .to_pandas()
    )
    by_lang = fine.groupby("lang", as_index=False)[["n_docs", "chars"]].sum()
    by_lang["source"] = None
    total = pd.DataFrame(
        {
            "lang": [None],
            "source": [None],
            "n_docs": [fine["n_docs"].sum()],
            "chars": [fine["chars"].sum()],
        }
    )
    out = pd.concat([fine, by_lang, total], ignore_index=True)
    out["lang"] = out["lang"].astype("object")
    out["source"] = out["source"].astype("object")
    return out[["lang", "source", "n_docs", "chars"]].astype(
        {"n_docs": "int64", "chars": "int64"}
    )

def sql_rollup_counts() -> str:
    return """
SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY ROLLUP (lang, source)
"""

def q_event_type_stats(sf_dir: str) -> pd.DataFrame:
    """Per-group mean/variance via distributed (n, Σv, Σv²) partials —
    the textbook one-pass moments combiner; the finalize runs on the
    group-cardinality-sized aggregate."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def add_sq(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.append_column("_v2", pc.multiply(b["value"], b["value"]))

    agg = (
        ds.map_batches(add_sq, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("value", alias_name="s"),
            Sum("_v2", alias_name="ss"),
        )
        .to_pandas()
    )
    n = agg["n"].astype("float64")
    mean = agg["s"] / n
    var = (agg["ss"] - agg["s"] * agg["s"] / n) / n
    return pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n": agg["n"].astype("int64"),
            "mean": mean.round(6).astype("float64"),
            "var": var.round(6).astype("float64"),
        }
    )

def sql_event_type_stats() -> str:
    # the same (n, Σv, Σv²) formula as the Ray combiner — NOT var_pop,
    # whose single-pass update order would differ in the last ulps
    return """
SELECT event_type, count(*) AS n,
       round(sum(value) / count(*), 6) AS mean,
       round((sum(value * value) - sum(value) * sum(value) / count(*)) / count(*), 6) AS var
FROM events GROUP BY event_type
"""

def q_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact distributed COUNT(DISTINCT): two-level aggregation — the
    (event_type, user_id) distinct groupby collapses N rows to the
    distinct-pair cardinality, then a count per event_type. No driver
    sets, no sort."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    # user-cardinality groups → partition-bucket distinct (hash user to
    # a partition, per-partition pandas distinct + count per type), then
    # one tiny native sum over (partition × type) partials — the native
    # (type, user) aggregate would pay per-distinct-pair Python
    def add_upart(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_up", pa.array((u.astype(np.uint64) % np.uint64(32)).astype(np.int32), pa.int32())
        )

    def count_distinct(g) -> pa.Table:
        df = g.to_pandas()
        out = (
            df.drop_duplicates(["event_type", "user_id"])
            .groupby("event_type", sort=False)
            .size()
            .reset_index(name="n_part")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(add_upart, batch_format="pyarrow")
        .groupby("_up")
        .map_groups(count_distinct, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_part", alias_name="n_users"))
        .to_pandas()
    )
    return out[["event_type", "n_users"]].astype({"n_users": "int64"})

def sql_distinct_users() -> str:
    return "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type"

def q_first_last(sf_dir: str) -> pd.DataFrame:
    """Per-user FIRST_VALUE/LAST_VALUE of (event_type, value) in
    (ts, event_id) order — bucket shuffle + vectorized dedup keep=first/
    last, no per-group Python."""
    import ray.data as rd

    from ..functions.windows import first_last_by_key

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = first_last_by_key(
        ds, "user_id", "ts", "event_id", ["event_type", "value"]
    ).to_pandas()
    for c in ("first_value", "last_value"):
        out[c] = out[c].round(4)
    return out.astype({"user_id": "int64"})

def sql_first_last() -> str:
    return """
WITH o AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS c
  FROM events
)
SELECT user_id,
       max(CASE WHEN rn = 1 THEN event_type END) AS first_event_type,
       round(max(CASE WHEN rn = 1 THEN value END), 4) AS first_value,
       max(CASE WHEN rn = c THEN event_type END) AS last_event_type,
       round(max(CASE WHEN rn = c THEN value END), 4) AS last_value
FROM o GROUP BY user_id
"""

def q_time_weighted_avg(sf_dir: str) -> pd.DataFrame:
    """Per-user time-weighted average of value (each reading holds
    until the next event) — the telemetry/billing aggregate; NULL for
    single-instant users."""
    import ray.data as rd

    from ..functions.windows import time_weighted_avg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    out = time_weighted_avg(ds, "user_id", "ts", "value", "event_id").to_pandas()
    return out.astype({"user_id": "int64"})

def sql_time_weighted_avg() -> str:
    # coalesce(w, 0) keeps single-event users in the result (NULL twa),
    # matching the Ray side's NaN row for zero total duration
    return """
WITH o AS (
  SELECT user_id, value,
         coalesce(lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  - epoch_us(ts), 0) AS w
  FROM events
)
SELECT user_id,
       round(CASE WHEN sum(w) > 0 THEN sum(value * w) / sum(w) END, 6) AS twa
FROM o GROUP BY user_id
"""

def q_anomaly_days(sf_dir: str) -> pd.DataFrame:
    """Operational anomaly detection: daily event counts per type,
    z-scored against that type's own 30-day profile; |z| ≥ 1.8 flagged.
    The distributed part is the (type, day) count shuffle (combiner-
    compressed); the z-score runs on the days×types-sized aggregate —
    legitimately driver-sized at any corpus scale."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from searchengine_ray.functions.analytics import _epoch_days

    def to_day(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "day": pa.array(_epoch_days(b["ts"]), pa.int64()),
            }
        )

    counts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
        .map_batches(to_day, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    g = counts.groupby("event_type")["n"]
    mu = g.transform("mean")
    # population stddev (ddof=0) matches SQL stddev_pop
    sd = g.transform(lambda s: s.std(ddof=0))
    z = (counts["n"] - mu) / sd
    counts["z"] = z.round(6)
    # filter on the ROUNDED z — the exact cross-engine contract
    out = counts[counts["z"].abs() >= 1.8].sort_values(["event_type", "day"]).reset_index(drop=True)
    return out.astype({"event_type": "object", "day": "int64", "n": "int64"})

def sql_anomaly_days() -> str:
    return """
WITH d AS (
  SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2),
zs AS (
  SELECT event_type, day, n,
         round((n - avg(n) OVER (PARTITION BY event_type))
               / stddev_pop(n) OVER (PARTITION BY event_type), 6) AS z
  FROM d)
SELECT event_type, day, n, z FROM zs WHERE abs(z) >= 1.8
"""

PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]

def q_retention(sf_dir: str) -> pd.DataFrame:
    """Retention triangle: users' first-active day (cohort) × days-since
    → distinct active users. Cohort assignment is a distributed hash
    join of the per-user min-day table back onto the stream — no
    user-count assumption (functions/analytics.py)."""
    import ray.data as rd

    from searchengine_ray.functions.analytics import retention_cohorts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    return retention_cohorts(ev)

def sql_retention() -> str:
    return """
WITH d AS (
  SELECT user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
  FROM events),
f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
       count(DISTINCT d.user_id) AS n_users
FROM d JOIN f USING (user_id)
GROUP BY 1, 2
"""

def q_cube_events(sf_dir: str) -> pd.DataFrame:
    """CUBE(event_type, day) in one pass: every batch emits partials for
    all four grouping sets with margin sentinels ('ALL' / -1), so the
    whole lattice costs one tiny shuffle (functions/analytics.py)."""
    import ray.data as rd

    from searchengine_ray.functions.analytics import cube_events

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
    return cube_events(ev)

def sql_cube_events() -> str:
    return """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)), -1) AS day,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY CUBE(event_type, CAST(ts AS DATE))
"""

def q_pivot_events(sf_dir: str) -> pd.DataFrame:
    """Pivot/crosstab: one row per user, one count column per event type
    (fixed schema); per-batch crosstab partials collapse the stream
    before the user-keyed shuffle (functions/analytics.py)."""
    import ray.data as rd

    from searchengine_ray.functions.analytics import pivot_user_events

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    return pivot_user_events(ev, PIVOT_TYPES)

def sql_pivot_events() -> str:
    cols = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
        for t in PIVOT_TYPES
    )
    return f"""
SELECT user_id,
       {cols}
FROM events GROUP BY user_id
"""

def q_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Exact top-30 corpus terms via the two-pass Misra-Gries design
    (candidate compression → broadcast-filtered exact recount with a
    provable exactness certificate) — the vocabulary never shuffles
    whole. functions/sketches.py module doc has the bound."""
    import ray.data as rd

    from searchengine_ray.functions.sketches import heavy_hitters

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return heavy_hitters(ds, top_k=30)

def sql_heavy_hitters() -> str:
    return r"""
WITH tok AS (
  SELECT unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                   '[ \t\n\x0b\f\r]+')) AS t
  FROM documents)
SELECT t AS term, count(*) AS n FROM tok WHERE t <> ''
GROUP BY t ORDER BY n DESC, term LIMIT 30
"""

def q_hll_sketch(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog register table (p=12) over events.user_id: per-batch
    partial max-rho registers (≤4096 rows/batch through the shuffle) →
    Max groupby. Integer-exact vs the SQL mirror; the float cardinality
    estimate derived from these registers is pytest-asserted within 2%
    of exact distinct."""
    import ray.data as rd

    from searchengine_ray.functions.sketches import hll_registers

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return hll_registers(ds, "user_id")

def sql_hll_sketch() -> str:
    # rho = leading zeros of the low 52 bits + 1 = 53 - bit_length(w);
    # bin() has no leading zeros so length(bin(w)) == bit_length(w)
    return """
WITH h AS (
  SELECT md5_number_lower(CAST(user_id AS VARCHAR)) AS hv FROM events
), rr AS (
  SELECT CAST(hv >> 52 AS BIGINT) AS register,
         CASE WHEN (hv & ((1::UBIGINT << 52) - 1)) = 0 THEN 53
              ELSE 53 - length(bin(hv & ((1::UBIGINT << 52) - 1))) END AS rho
  FROM h)
SELECT register, CAST(max(rho) AS BIGINT) AS rho FROM rr GROUP BY register
"""

def q_session_lengths(sf_dir: str) -> pd.DataFrame:
    """Session-length distribution + bounce share: composes the
    gaps-and-islands sessionizer with a count-of-counts histogram —
    the engagement metric read off the already-aggregated session
    table, so the second shuffle is the tiny length domain."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..functions.windows import sessionize

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    sess = sessionize(
        ds, user_col="user_id", ts_col="ts", value_col="value",
        gap_us=1_800_000_000, id_col="event_id",
    )
    hist = (
        sess.groupby("n_events").aggregate(Count(alias_name="n_sessions")).to_pandas()
    )
    total = float(hist["n_sessions"].sum())
    hist["share"] = round_half_away(hist["n_sessions"] / total)
    hist = hist.sort_values("n_events").reset_index(drop=True)
    return hist.astype({"n_events": "int64", "n_sessions": "int64"})

def sql_session_lengths() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t FROM events
), b AS (
  SELECT *, CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS session
  FROM b
), sess AS (
  SELECT user_id, session, count(*) AS n_events FROM s GROUP BY 1, 2
)
SELECT n_events, count(*) AS n_sessions,
       round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM sess), 6) AS share
FROM sess GROUP BY n_events
"""

def q_event_paths(sf_dir: str) -> pd.DataFrame:
    """Top-10 3-step event paths within sessions (behavioral sequence
    mining): per-user bucket shuffle → vectorized gaps-and-islands
    sessionize + within-session trigram counts per bucket (partials)
    → one path-vocabulary groupby. The n-gram-over-event-streams
    analogue of the text bigram combiner."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    GAP_US = 1_800_000_000

    _EMPTY = pa.table(
        {"path": pa.array([], pa.string()), "n_part": pa.array([], pa.int64())}
    )

    def trigrams(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): path strings are built with
        # one vectorized object-array concat over the qualifying
        # trigram positions, counted with np.unique.
        t0 = g["t"].to_numpy(zero_copy_only=False)
        u0 = g["user_id"].to_numpy(zero_copy_only=False)
        e0 = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort([e0, t0, u0])
        t, u = t0[order], u0[order]
        et = g["event_type"].to_numpy(zero_copy_only=False)[order]
        n = len(t)
        new_run = np.ones(n, bool)
        if n > 1:
            new_run[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > GAP_US)
        sess = np.cumsum(new_run)
        sel = np.flatnonzero(sess[2:] == sess[:-2]) if n > 2 else np.empty(0, np.int64)
        if not len(sel):
            return _EMPTY
        paths = et[sel] + ">" + et[sel + 1] + ">" + et[sel + 2]
        uniq, counts = np.unique(paths.astype(str), return_counts=True)
        return pa.table(
            {
                "path": pa.array(uniq, pa.string()),
                "n_part": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "t": pa.compute.cast(b["ts"], pa.int64()),
                "event_type": b["event_type"],
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    ).map_batches(prep, batch_format="pyarrow")
    out = (
        ds.groupby("user_id")
        .map_groups(trigrams, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    out = out.sort_values(["n", "path"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True).astype({"path": "object", "n": "int64"})

def sql_event_paths() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
), b AS (
  SELECT *, CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS session
  FROM b
), o AS (
  SELECT user_id, session, event_type,
         row_number() OVER (PARTITION BY user_id, session ORDER BY t, event_id) AS rn
  FROM s
)
SELECT a.event_type || '>' || m.event_type || '>' || z.event_type AS path,
       count(*) AS n
FROM o a
JOIN o m ON m.user_id = a.user_id AND m.session = a.session AND m.rn = a.rn + 1
JOIN o z ON z.user_id = a.user_id AND z.session = a.session AND z.rn = a.rn + 2
GROUP BY 1 ORDER BY n DESC, path LIMIT 10
"""
