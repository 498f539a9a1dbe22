"""Windowed-aggregate operators Ray Data lacks natively.

``sliding_window_agg``: hopping/sliding time windows (size s, hop h,
h ≤ s). Each event belongs to the ``s/h`` windows covering its
timestamp; the replication is a vectorized ``np.repeat`` inside
``map_batches`` (rows × s/h through ONE ``groupby`` shuffle, partials
pre-combined per block first so only (window, key) partial rows move).

``sessionize``: gap-based session windows per user (the streaming
"session window" primitive — events of one user whose gaps are ≤ gap
form one session). Composition: key-hash bucket tag → ONE
``groupby(bucket)`` shuffle → per-bucket vectorized gaps-and-islands
(sort by (user, ts, id); session boundary where user changes or the
time delta exceeds the gap; cumsum → session ids; one pandas groupby
for the per-session aggregate).

Partitioning assumption (per the SURVEY custom-operator rule): a
bucket holds every event of its users, so per-bucket volume must fit a
worker — users are hash-spread over ``n_buckets`` (size ≫ cores at
scale) and a single user's traffic bounds the worst bucket. Window
replication assumes s/h is small (≤ ~16); larger ratios should raise
the hop, not replicate more.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sliding_window_agg(
    ds,
    ts_col: str,
    keys: list[str],
    value_col: str,
    size_us: int,
    hop_us: int,
):
    """Count + sum of ``value_col`` per (window, *keys) hopping window.

    Window ``w`` covers ``[w*hop, w*hop + size)``; an event at ``t``
    belongs to windows ``floor(t/hop) - j`` for ``j in
    [0, size/hop)``. Returns a Dataset with columns
    ``window, *keys, n_events, sum_value`` (window = hop index,
    int64). ``size_us`` must be a multiple of ``hop_us``.
    """
    if size_us % hop_us:
        raise ValueError("size_us must be a multiple of hop_us")
    n_rep = size_us // hop_us
    from ray.data.aggregate import Count, Sum

    def replicate(b: pa.Table) -> pa.Table:
        t = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = t // hop_us
        idx = np.repeat(np.arange(len(t)), n_rep)
        win = np.repeat(base, n_rep) - np.tile(
            np.arange(n_rep, dtype=np.int64), len(t)
        )
        cols = {"window": pa.array(win, pa.int64())}
        for k in keys:
            cols[k] = b[k].take(pa.array(idx))
        cols[value_col] = b[value_col].take(pa.array(idx))
        return pa.table(cols)

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby(["window", *keys])
        .aggregate(
            Count(alias_name="n_events"), Sum(value_col, alias_name="sum_value")
        )
    )


def sessionize(
    ds,
    user_col: str,
    ts_col: str,
    value_col: str,
    gap_us: int,
    id_col: str | None = None,
    n_buckets: int = 32,
):
    """Gap-based session windows per user.

    Returns a Dataset with one row per session:
    ``user_col, session (1-based per user, time order), session_start
    (int64 epoch µs), n_events, sum_value``. Events of one user whose
    consecutive gaps are ≤ ``gap_us`` share a session. ``id_col``
    breaks timestamp ties deterministically.
    """

    def tag(b: pa.Table) -> pa.Table:
        users = b[user_col].to_pandas()
        bucket = (
            pd.util.hash_array(users.to_numpy()) % np.uint64(n_buckets)
        ).astype(np.int32)
        cols = {
            "_bucket": pa.array(bucket, pa.int32()),
            user_col: b[user_col],
            "_ts": b[ts_col].cast(pa.int64()),
            "_val": b[value_col],
        }
        if id_col is not None:
            cols["_id"] = b[id_col]
        return pa.table(cols)

    def sessions_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = [user_col, "_ts"] + (["_id"] if "_id" in g.columns else [])
        g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
        u = g[user_col].to_numpy()
        t = g["_ts"].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap_break = np.empty(len(g), dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (t[1:] - t[:-1]) > gap_us
        boundary = new_user | gap_break
        sess_global = np.cumsum(boundary)
        # per-user 1-based session number: subtract the user's first
        # global session id (sessions are contiguous within a user)
        first_of_user = np.where(new_user, sess_global, 0)
        np.maximum.accumulate(first_of_user, out=first_of_user)
        g2 = pd.DataFrame(
            {
                user_col: u,
                "session": (sess_global - first_of_user + 1).astype(np.int64),
                "_gsess": sess_global,
                "_ts": t,
                "_val": g["_val"].to_numpy(),
            }
        )
        out = (
            g2.groupby("_gsess", sort=True)
            .agg(
                **{
                    user_col: (user_col, "first"),
                    "session": ("session", "first"),
                    "session_start": ("_ts", "min"),
                    "n_events": ("_val", "size"),
                    "sum_value": ("_val", "sum"),
                }
            )
            .reset_index(drop=True)
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    def empty_safe(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    user_col: pd.Series([], dtype="int64"),
                    "session": pd.Series([], dtype="int64"),
                    "session_start": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "sum_value": pd.Series([], dtype="float64"),
                }
            )
        return sessions_of_bucket(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(empty_safe, batch_format="pandas")
    )


def running_total(
    ds,
    user_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    n_buckets: int = 32,
    ndigits: int = 4,
):
    """Per-key cumulative sum in time order — the running-balance /
    cumulative-spend window scan (``sum(value) OVER (PARTITION BY user
    ORDER BY ts, id)``).

    Same scale shape as :func:`sessionize`: one key-hash bucket shuffle,
    then a vectorized per-bucket pass (sort + pandas per-group cumsum —
    sequential accumulation in exactly the order a SQL running sum
    adds, so the rounded values are oracle-comparable). Returns a
    Dataset ``(id_col, user_col, running)``."""

    def tag(b: pa.Table) -> pa.Table:
        users = b[user_col].to_pandas()
        bucket = (
            pd.util.hash_array(users.to_numpy()) % np.uint64(n_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "_bucket": pa.array(bucket, pa.int32()),
                user_col: b[user_col],
                "_ts": b[ts_col].cast(pa.int64()),
                "_val": b[value_col],
                id_col: b[id_col],
            }
        )

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    user_col: pd.Series([], dtype="int64"),
                    "running": pd.Series([], dtype="float64"),
                }
            )
        g = g.sort_values([user_col, "_ts", id_col], kind="mergesort").reset_index(
            drop=True
        )
        run = g.groupby(user_col, sort=False)["_val"].cumsum().round(ndigits)
        return pd.DataFrame(
            {
                id_col: g[id_col].astype("int64"),
                user_col: g[user_col].astype("int64"),
                "running": run.astype("float64"),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pandas")
    )


def lag_delta(
    ds,
    user_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    n_buckets: int = 32,
    ndigits: int = 4,
):
    """Per-key previous value + delta in time order — the LAG window
    (``value - lag(value) OVER (PARTITION BY user ORDER BY ts, id)``).

    Same scale shape as :func:`running_total`: one key-hash bucket
    shuffle, vectorized per-bucket sort + groupby shift. Returns a
    Dataset ``(id_col, user_col, prev, delta)`` — ``prev``/``delta``
    NULL on each key's first event, exactly as SQL LAG."""

    def tag(b: pa.Table) -> pa.Table:
        users = b[user_col].to_pandas()
        bucket = (
            pd.util.hash_array(users.to_numpy()) % np.uint64(n_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "_bucket": pa.array(bucket, pa.int32()),
                user_col: b[user_col],
                "_ts": b[ts_col].cast(pa.int64()),
                "_val": b[value_col],
                id_col: b[id_col],
            }
        )

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    user_col: pd.Series([], dtype="int64"),
                    "prev": pd.Series([], dtype="float64"),
                    "delta": pd.Series([], dtype="float64"),
                }
            )
        g = g.sort_values([user_col, "_ts", id_col], kind="mergesort").reset_index(
            drop=True
        )
        prev = g.groupby(user_col, sort=False)["_val"].shift(1)
        delta = (g["_val"] - prev).round(ndigits)
        return pd.DataFrame(
            {
                id_col: g[id_col].astype("int64"),
                user_col: g[user_col].astype("int64"),
                "prev": prev.round(ndigits).astype("float64"),
                "delta": delta.astype("float64"),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pandas")
    )


def first_last_by_key(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_cols: list[str],
    n_buckets: int = 32,
):
    """Per-key FIRST_VALUE/LAST_VALUE in (ts, id) order, for each of
    ``value_cols`` — one key-hash bucket shuffle, then a vectorized
    per-bucket sort + ``drop_duplicates(keep=...)`` (no per-group
    Python). Returns ``(key, first_<col>..., last_<col>...)``."""

    def tag(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pandas()
        bucket = (
            pd.util.hash_array(keys.to_numpy()) % np.uint64(n_buckets)
        ).astype(np.int32)
        cols = {"_bucket": pa.array(bucket, pa.int32()), key_col: b[key_col],
                "_ts": b[ts_col].cast(pa.int64()), id_col: b[id_col]}
        for c in value_cols:
            cols[c] = b[c]
        return pa.table(cols)

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # works for empty buckets too: every step below preserves the
        # input dtypes, so group schemas stay consistent for Ray's concat
        g = g.sort_values([key_col, "_ts", id_col], kind="mergesort")
        first = g.drop_duplicates(key_col, keep="first").set_index(key_col)
        last = g.drop_duplicates(key_col, keep="last").set_index(key_col)
        out = pd.DataFrame({key_col: first.index.to_numpy()})
        for c in value_cols:
            out[f"first_{c}"] = first[c].to_numpy()
            out[f"last_{c}"] = last[c].to_numpy()
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pandas")
    )


def time_weighted_avg(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    n_buckets: int = 32,
    ndigits: int = 6,
):
    """Per-key time-weighted average: each value holds until the key's
    next event, ``Σ v_i·(t_{i+1}-t_i) / (t_last-t_first)`` — the
    telemetry/billing staple. NULL for keys whose events share one
    timestamp (zero total duration). One bucket shuffle, vectorized
    per-bucket diff."""

    def tag(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pandas()
        bucket = (
            pd.util.hash_array(keys.to_numpy()) % np.uint64(n_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "_bucket": pa.array(bucket, pa.int32()),
                key_col: b[key_col],
                "_ts": b[ts_col].cast(pa.int64()),
                "_val": b[value_col],
                id_col: b[id_col],
            }
        )

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="int64"),
                    "twa": pd.Series([], dtype="float64"),
                }
            )
        g = g.sort_values([key_col, "_ts", id_col], kind="mergesort").reset_index(
            drop=True
        )
        keys = g[key_col].to_numpy()
        ts = g["_ts"].to_numpy(np.float64)
        val = g["_val"].to_numpy(np.float64)
        nxt = np.empty_like(ts)
        nxt[:-1] = ts[1:]
        nxt[-1] = ts[-1]
        same = np.empty(len(g), bool)
        same[:-1] = keys[1:] == keys[:-1]
        same[-1] = False
        w = np.where(same, nxt - ts, 0.0)
        uniq, start = np.unique(keys, return_index=True)
        num = np.add.reduceat(val * w, start)
        den = np.add.reduceat(w, start)
        twa = np.where(den > 0, num / np.maximum(den, 1.0), np.nan)
        return pd.DataFrame(
            {
                key_col: pd.Series(uniq, dtype="int64"),
                "twa": pd.Series(np.round(twa, ndigits), dtype="float64"),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pandas")
    )


def funnel_counts(
    ds,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    steps: tuple = ("view", "click", "purchase"),
    n_buckets: int = 32,
):
    """Greedy ordered-funnel analysis: how many keys reach step 1, then
    step 2 strictly after their earliest step-1 event, then step 3
    strictly after that step-2 event (the product-analytics staple).

    One key-hash bucket shuffle; inside each bucket the scan is
    vectorized (per-key positions + filtered groupby-mins — no Python
    loop over keys). Emits one partial-count row per bucket; the caller
    sums. Returns a Dataset with columns n_step1, n_step2, n_step3."""

    def tag(b: pa.Table) -> pa.Table:
        keys = b[user_col].to_pandas()
        bucket = (
            pd.util.hash_array(keys.to_numpy()) % np.uint64(n_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "_bucket": pa.array(bucket, pa.int32()),
                user_col: b[user_col],
                "_ts": b[ts_col].cast(pa.int64()),
                "_et": b[type_col],
                id_col: b[id_col],
            }
        )

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {f"n_step{i+1}": pd.Series([0], dtype="int64") for i in range(len(steps))}
            )
        g = g.sort_values([user_col, "_ts", id_col], kind="mergesort").reset_index(drop=True)
        uid = g[user_col].to_numpy()
        # per-key position in (ts, id) order
        _, starts, counts = np.unique(uid, return_index=True, return_counts=True)
        pos = np.arange(len(g), dtype=np.int64) - np.repeat(starts, counts)
        g = g.assign(_pos=pos)
        reached = None  # Series: key -> position of the matched step event
        out = {}
        for i, step in enumerate(steps):
            sub = g[g["_et"] == step]
            if reached is not None:
                prev = sub[user_col].map(reached)
                sub = sub[prev.notna() & (sub["_pos"] > prev)]
            reached = sub.groupby(user_col)["_pos"].min()
            out[f"n_step{i+1}"] = pd.Series([len(reached)], dtype="int64")
        return pd.DataFrame(out)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pandas")
    )
