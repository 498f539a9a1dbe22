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

    _EMPTY = pa.table(
        {
            user_col: pa.array([], pa.int64()),
            "session": pa.array([], pa.int64()),
            "session_start": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.float64()),
        }
    )

    def sessions_of_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): zero-copy numpy views, stable
        # lexsort, and segment ops over contiguous sessions — same
        # accumulation order as the former pandas groupby, so values
        # (and oracle hashes) are unchanged.
        if g.num_rows == 0:
            return _EMPTY
        u = g[user_col].to_numpy(zero_copy_only=False)
        t = g["_ts"].to_numpy(zero_copy_only=False)
        v = g["_val"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        sort_keys = [t, u] if "_id" not in g.column_names else [
            g["_id"].to_numpy(zero_copy_only=False), t, u,
        ]
        order = np.lexsort(sort_keys)  # last key is primary → (user, ts[, id])
        u, t, v = u[order], t[order], v[order]
        n = len(u)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        boundary = new_user.copy()
        boundary[1:] |= (t[1:] - t[:-1]) > gap_us
        sess_global = np.cumsum(boundary)
        # per-user 1-based session number: subtract the user's first
        # global session id (sessions are contiguous within a user)
        first_of_user = np.where(new_user, sess_global, 0)
        np.maximum.accumulate(first_of_user, out=first_of_user)
        starts = np.flatnonzero(boundary)
        return pa.table(
            {
                user_col: pa.array(u[starts].astype(np.int64), pa.int64()),
                "session": pa.array(
                    (sess_global - first_of_user + 1)[starts].astype(np.int64),
                    pa.int64(),
                ),
                "session_start": pa.array(t[starts], pa.int64()),
                "n_events": pa.array(
                    np.diff(np.append(starts, n)).astype(np.int64), pa.int64()
                ),
                "sum_value": pa.array(np.add.reduceat(v, starts), pa.float64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(sessions_of_bucket, batch_format="pyarrow")
    )


def _segment_cumsum(v: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Sequential cumulative sum per contiguous segment — same float
    accumulation order as a pandas per-group cumsum. One C-speed
    ``np.add.accumulate`` per segment; the Python loop is over KEYS in
    the bucket (tiny), not rows."""
    out = v.copy()
    ends = np.append(starts[1:], len(v))
    for s, e in zip(starts, ends):
        np.add.accumulate(out[s:e], out=out[s:e])
    return out


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

    _EMPTY = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            user_col: pa.array([], pa.int64()),
            "running": pa.array([], pa.float64()),
        }
    )

    def scan_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5). The per-key cumulative sum
        # keeps pandas' EXACT accumulation order: one sequential
        # accumulate per contiguous key segment (start value re-seeded
        # at each boundary), not a global-cumsum-minus-prefix trick
        # whose float association differs.
        if g.num_rows == 0:
            return _EMPTY
        u = g[user_col].to_numpy(zero_copy_only=False)
        t = g["_ts"].to_numpy(zero_copy_only=False)
        v = g["_val"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        i = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort([i, t, u])
        u, v, i = u[order], v[order], i[order]
        n = len(u)
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(boundary)
        run = _segment_cumsum(v, starts)
        return pa.table(
            {
                id_col: pa.array(i.astype(np.int64), pa.int64()),
                user_col: pa.array(u.astype(np.int64), pa.int64()),
                "running": pa.array(np.round(run, ndigits), pa.float64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pyarrow")
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

    _EMPTY = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            user_col: pa.array([], pa.int64()),
            "prev": pa.array([], pa.float64()),
            "delta": pa.array([], pa.float64()),
        }
    )

    def scan_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): LAG is an exact shift-by-one
        # within contiguous key segments — no accumulation, so the
        # numpy rewrite is bit-identical to the pandas groupby shift.
        if g.num_rows == 0:
            return _EMPTY
        u = g[user_col].to_numpy(zero_copy_only=False)
        t = g["_ts"].to_numpy(zero_copy_only=False)
        v = g["_val"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        i = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort([i, t, u])
        u, v, i = u[order], v[order], i[order]
        n = len(u)
        prev = np.empty(n, np.float64)
        prev[0] = np.nan
        prev[1:] = np.where(u[1:] == u[:-1], v[:-1], np.nan)
        delta = np.round(v - prev, ndigits)
        null_mask = np.isnan(prev)
        return pa.table(
            {
                id_col: pa.array(i.astype(np.int64), pa.int64()),
                user_col: pa.array(u.astype(np.int64), pa.int64()),
                "prev": pa.array(np.round(prev, ndigits), mask=null_mask),
                "delta": pa.array(delta, mask=null_mask),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pyarrow")
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

    def scan_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): after the stable lexsort,
        # each key's first/last rows sit at its segment boundaries;
        # ``take`` at those indices preserves the input value-column
        # types exactly (including for empty buckets, so group schemas
        # stay consistent for Ray's concat).
        if g.num_rows == 0:
            # slice(0,0) keeps each value column's input type, so empty
            # buckets stay schema-consistent for Ray's concat
            cols = {key_col: g[key_col].slice(0, 0)}
            for c in value_cols:
                cols[f"first_{c}"] = g[c].slice(0, 0)
                cols[f"last_{c}"] = g[c].slice(0, 0)
            return pa.table(cols)
        k = g[key_col].to_numpy(zero_copy_only=False)
        t = g["_ts"].to_numpy(zero_copy_only=False)
        i = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort([i, t, k])
        k = k[order]
        n = len(k)
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], n) - 1
        cols = {key_col: pa.array(k[starts])}
        first_idx = pa.array(order[starts], pa.int64())
        last_idx = pa.array(order[ends], pa.int64())
        for c in value_cols:
            cols[f"first_{c}"] = g[c].take(first_idx)
            cols[f"last_{c}"] = g[c].take(last_idx)
        return pa.table(cols)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pyarrow")
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

    _EMPTY = pa.table(
        {
            key_col: pa.array([], pa.int64()),
            "twa": pa.array([], pa.float64()),
        }
    )

    def scan_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): the kernel was already numpy
        # after the sort; only the sort + boundary conversion changed.
        if g.num_rows == 0:
            return _EMPTY
        keys = g[key_col].to_numpy(zero_copy_only=False)
        ts0 = g["_ts"].to_numpy(zero_copy_only=False)
        val0 = g["_val"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort([ids, ts0, keys])
        keys = keys[order]
        ts = ts0[order].astype(np.float64)
        val = val0[order].astype(np.float64)
        nxt = np.empty_like(ts)
        nxt[:-1] = ts[1:]
        nxt[-1] = ts[-1]
        same = np.empty(len(keys), bool)
        same[:-1] = keys[1:] == keys[:-1]
        same[-1] = False
        w = np.where(same, nxt - ts, 0.0)
        uniq, start = np.unique(keys, return_index=True)
        num = np.add.reduceat(val * w, start)
        den = np.add.reduceat(w, start)
        twa = np.round(np.where(den > 0, num / np.maximum(den, 1.0), np.nan), ndigits)
        return pa.table(
            {
                key_col: pa.array(uniq.astype(np.int64), pa.int64()),
                "twa": pa.array(twa, mask=np.isnan(twa)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pyarrow")
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

    def scan_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): step membership is computed
        # with a pyarrow string-equal kernel (no Python strings), the
        # greedy per-key state is a sorted (keys, pos) array pair
        # probed with searchsorted, and "earliest qualifying event per
        # key" is the first occurrence in the (user, ts, id) sort.
        import pyarrow.compute as pc

        if g.num_rows == 0:
            return pa.table(
                {f"n_step{i+1}": pa.array([0], pa.int64()) for i in range(len(steps))}
            )
        uid0 = g[user_col].to_numpy(zero_copy_only=False)
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort([ids, ts, uid0])
        uid = uid0[order]
        # per-key position in (ts, id) order
        _, starts, counts = np.unique(uid, return_index=True, return_counts=True)
        pos = np.arange(len(uid), dtype=np.int64) - np.repeat(starts, counts)
        r_keys = r_pos = None  # sorted key -> position of matched step event
        out = {}
        for i, step in enumerate(steps):
            sel = pc.equal(g["_et"], step).to_numpy(zero_copy_only=False)[order]
            sel_idx = np.flatnonzero(sel)
            if r_keys is not None:
                if len(r_keys) == 0:
                    sel_idx = sel_idx[:0]  # nothing reached the prior step
                else:
                    at = np.searchsorted(r_keys, uid[sel_idx])
                    at_c = np.minimum(at, len(r_keys) - 1)
                    valid = (at < len(r_keys)) & (r_keys[at_c] == uid[sel_idx])
                    keep = valid & (pos[sel_idx] > np.where(valid, r_pos[at_c], -1))
                    sel_idx = sel_idx[keep]
            # rows are (user, ts, id)-sorted, so the first row per key
            # in sel_idx carries that key's minimum position
            r_keys, first = np.unique(uid[sel_idx], return_index=True)
            r_pos = pos[sel_idx][first]
            out[f"n_step{i+1}"] = pa.array([len(r_keys)], pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pyarrow")
    )
