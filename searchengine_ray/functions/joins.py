"""Custom join operators Ray Data lacks natively.

``asof_join``: for each left row (key, t) attach the right row with the
same key and the greatest ``on`` ≤ t (backward as-of; the sessionize /
point-in-time-lookup primitive). Composition: tag each side with a
key-hash bucket → one ``union`` → ONE all-to-all ``groupby(bucket)``
shuffle → vectorized ``pd.merge_asof`` per bucket (time-sorted, per-key).

Partitioning assumption (documented per SURVEY custom-operator rule):
a bucket holds every row of its keys on both sides, so per-bucket data
must fit a worker — keys are hash-spread across ``n_buckets`` (size to
≫ cluster cores at scale), and a single hot key's rows are bounded by
that key's own traffic. A single key hotter than worker memory needs
time-range sub-partitioning with boundary replication of the right
side; not needed at this engine's event volumes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucket_of(vals: pd.Series, n_buckets: int) -> np.ndarray:
    return (pd.util.hash_array(vals.to_numpy()) % np.uint64(n_buckets)).astype(np.int32)


def range_join(
    left_ds,
    right_ds,
    left_ts: str,
    right_start: str,
    right_end: str,
    left_cols: list[str],
    right_cols: list[str],
    bucket_us: int,
    suffix: str = "_r",
):
    """Interval range join: each left row (at time ``left_ts``) is
    matched to every right interval ``[right_start, right_end)``
    containing it. Ray Data has no non-equi join; this composes one:

    - left rows are tagged with time bucket ``floor(t / bucket_us)``
      (each left row lands in exactly ONE bucket);
    - right intervals are replicated to every bucket they overlap
      (vectorized ``np.repeat``; ≤ 2 copies when ``bucket_us`` ≥ the
      longest interval);
    - both sides union into ONE ``groupby(bucket)`` shuffle; inside a
      bucket, left timestamps are sorted once and each interval finds
      its matching slice with two ``np.searchsorted`` calls.

    Every matched pair appears exactly once (the left row's bucket is
    unique). Partitioning assumption: ``bucket_us`` should be ≥ the
    longest right interval (bounds replication at 2×) and small enough
    that one bucket's rows fit a worker; a time-skewed hot bucket needs
    a finer ``bucket_us``. Timestamp columns must be Arrow
    timestamp/integer types (compared as int64 µs).

    Returns a Dataset with ``left_cols + [c + suffix for c in
    right_cols]`` (inner join: unmatched left rows drop out).
    """
    l_schema = dict(zip(left_ds.schema().names, left_ds.schema().types))
    r_schema = dict(zip(right_ds.schema().names, right_ds.schema().types))
    r_out = [c + suffix for c in right_cols]

    def tag_left(b: pa.Table) -> pa.Table:
        t = b[left_ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cols = {
            "_bucket": pa.array(t // bucket_us, pa.int64()),
            "_side": pa.array(np.zeros(len(t), np.int8), pa.int8()),
            "_t": pa.array(t, pa.int64()),
            "_s": pa.nulls(len(t), pa.int64()),
            "_e": pa.nulls(len(t), pa.int64()),
        }
        for c in left_cols:
            cols[c] = b[c]
        for c, cr in zip(right_cols, r_out):
            cols[cr] = pa.nulls(len(t), r_schema[c])
        return pa.table(cols)

    def replicate_right(b: pa.Table) -> pa.Table:
        s = b[right_start].cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = b[right_end].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = s // bucket_us
        b1 = np.maximum(b0, (e - 1) // bucket_us)  # last bucket touched
        counts = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), counts)
        # bucket sequence b0[i] .. b1[i] per interval, vectorized
        offs = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        cols = {
            "_bucket": pa.array(b0[idx] + offs, pa.int64()),
            "_side": pa.array(np.ones(len(idx), np.int8), pa.int8()),
            "_t": pa.nulls(len(idx), pa.int64()),
            "_s": pa.array(s[idx], pa.int64()),
            "_e": pa.array(e[idx], pa.int64()),
        }
        take = pa.array(idx)
        for c in left_cols:
            cols[c] = pa.nulls(len(idx), l_schema[c])
        for c, cr in zip(right_cols, r_out):
            cols[cr] = b[c].take(take)
        return pa.table(cols)

    out_cols = left_cols + r_out

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): the slice-match kernel was
        # already two searchsorted calls; row materialization is now
        # ``Table.take`` (any column type, no pandas dtype round-trip).
        import pyarrow.compute as pc

        mask_l = pc.equal(g["_side"], 0)
        lf = g.filter(mask_l)
        rf = g.filter(pc.invert(mask_l))
        if lf.num_rows == 0 or rf.num_rows == 0:
            return g.select(out_cols).schema.empty_table()
        t0 = lf["_t"].to_numpy(zero_copy_only=False)
        order = np.argsort(t0, kind="stable")
        t = t0[order]
        lo = np.searchsorted(t, rf["_s"].to_numpy(zero_copy_only=False), side="left")
        hi = np.searchsorted(t, rf["_e"].to_numpy(zero_copy_only=False), side="left")
        n_match = hi - lo
        r_idx = np.repeat(np.arange(rf.num_rows), n_match)
        l_idx = np.arange(n_match.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(n_match) - n_match, n_match
        ) + np.repeat(lo, n_match)
        left_part = lf.select(left_cols).take(pa.array(order[l_idx]))
        right_part = rf.select(r_out).take(pa.array(r_idx))
        return pa.table(
            {**{c: left_part[c] for c in left_cols},
             **{c: right_part[c] for c in r_out}}
        )

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(replicate_right, batch_format="pyarrow")
    )
    return unioned.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def asof_join(
    left_ds,
    right_ds,
    on: str,
    by: str,
    left_cols: list[str],
    right_cols: list[str],
    direction: str = "backward",
    n_buckets: int = 32,
    suffix: str = "_r",
):
    """Backward/forward as-of join of two Datasets; returns a Dataset
    with columns ``[by, on] + left_cols + [c+suffix for c in right_cols]``
    (inner: left rows with no match are dropped)."""
    r_out = [c + suffix for c in right_cols]
    l_schema = dict(zip(left_ds.schema().names, left_ds.schema().types))
    r_schema = dict(zip(right_ds.schema().names, right_ds.schema().types))
    l_types = {c: l_schema[c] for c in left_cols}
    r_types = {c: r_schema[c] for c in right_cols}

    def unify(side: int):
        # both sides emit ONE schema (typed nulls for the other side's
        # payload) so the union'd blocks shuffle as a single Arrow type
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            key = b[by].to_pandas()
            cols: dict[str, pa.Array | pa.ChunkedArray] = {
                "_bucket": pa.array(_bucket_of(key, n_buckets), pa.int32()),
                by: b[by],
                on: b[on],
                "_side": pa.array(np.full(n, side, np.int8), pa.int8()),
            }
            for c in left_cols:
                cols[c] = b[c] if side == 0 else pa.nulls(n, l_types[c])
            for c, cr in zip(right_cols, r_out):
                cols[cr] = b[c] if side == 1 else pa.nulls(n, r_types[c])
            return pa.table(cols)

        return f

    unioned = left_ds.map_batches(unify(0), batch_format="pyarrow").union(
        right_ds.map_batches(unify(1), batch_format="pyarrow")
    )

    # ``pd.merge_asof`` is the load-bearing per-bucket kernel (a
    # vectorized per-key backward/forward match numpy has no primitive
    # for) — but the GROUP boundary is Arrow: each side is filtered and
    # column-pruned BEFORE its pandas conversion, so the typed-null
    # union padding never round-trips through float64/NaN.
    out_dtypes = {
        **{c: t.to_pandas_dtype() for c, t in l_types.items()},
        **{cr: r_types[c].to_pandas_dtype() for c, cr in zip(right_cols, r_out)},
    }
    out_cols = [by, on] + left_cols + r_out

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask_l = pc.equal(g["_side"], 0)
        lf_t = g.filter(mask_l).select([by, on] + left_cols)
        rf_t = g.filter(pc.invert(mask_l)).select([by, on] + r_out)
        if lf_t.num_rows == 0 or rf_t.num_rows == 0:
            return g.select(out_cols).schema.empty_table()
        lf = lf_t.to_pandas().sort_values(on, kind="mergesort")
        rf = rf_t.to_pandas().sort_values(on, kind="mergesort").assign(_m=np.int8(1))
        out = pd.merge_asof(lf, rf, on=on, by=by, direction=direction)
        out = out[out["_m"].notna()][out_cols].astype(out_dtypes, copy=False)
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            g.select(out_cols).schema
        )

    return unioned.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def semi_anti_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    anti: bool = False,
    n_buckets: int = 64,
    broadcast_limit: int = 1_000_000,
):
    """Distributed SEMI (``anti=False``) / ANTI (``anti=True``) join:
    left rows that have (no) match in right — membership only, right
    columns never materialize.

    Right keys are first collapsed to DISTINCT inside each batch and
    then globally (combiner → groupby), so the shuffled volume is
    key-cardinality-, not row-, sized. Two executions of the probe:

    - **broadcast tier** (distinct keys ≤ ``broadcast_limit``): one
      ``ray.put`` of the sorted key array, one vectorized ``np.isin``
      mask per left batch — zero shuffle of the left side (the right
      pattern whenever the right side is dimension-like);
    - **co-partition tier**: both sides tagged with a key-hash bucket,
      one union + ONE ``groupby(bucket)`` shuffle, per-bucket
      vectorized ``isin`` — nothing driver-sized, works when the right
      key set itself is fact-scale.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    keys_ds = (
        right_ds.map_batches(
            lambda b: pa.table({right_key: b[right_key].unique()}),
            batch_format="pyarrow",
        )
        .groupby(right_key)
        .aggregate(Count(alias_name="_c"))
    )
    n_keys = keys_ds.count()

    if n_keys <= broadcast_limit:
        keys = np.sort(
            keys_ds.to_pandas()[right_key].to_numpy()
        )
        ref = ray.put(keys)

        def probe(b: pa.Table, _r=ref) -> pa.Table:
            member = np.isin(
                b[left_key].to_numpy(zero_copy_only=False), ray.get(_r),
                assume_unique=False,
            )
            return b.filter(pa.array(~member if anti else member))

        return left_ds.map_batches(probe, batch_format="pyarrow")

    # co-partition tier: tag side + bucket, one shuffle, per-bucket isin
    lschema = left_ds.schema()
    left_types = dict(zip(lschema.names, lschema.types))
    left_cols = list(lschema.names)

    def tag_left(b: pa.Table) -> pa.Table:
        bk = _bucket_of(b[left_key].to_pandas(), n_buckets)
        return b.append_column("_bkt", pa.array(bk, pa.int32())).append_column(
            "_side", pa.array(np.zeros(b.num_rows, np.int8), pa.int8())
        )

    def tag_right(b: pa.Table) -> pa.Table:
        t = pa.table({left_key: b[right_key].cast(left_types[left_key])})
        # null-pad the other left columns so the union schema lines up
        for c in left_cols:
            if c != left_key:
                t = t.append_column(c, pa.nulls(t.num_rows, left_types[c]))
        bk = _bucket_of(t[left_key].to_pandas(), n_buckets)
        t = t.append_column("_bkt", pa.array(bk, pa.int32()))
        return t.append_column("_side", pa.array(np.ones(t.num_rows, np.int8), pa.int8()))

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        keys_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def probe_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): same vectorized isin, no
        # per-group pandas conversion of the left payload columns.
        import pyarrow.compute as pc

        mask_l = pc.equal(g["_side"], 0)
        rk = g.filter(pc.invert(mask_l))[left_key].to_numpy(zero_copy_only=False)
        lf = g.filter(mask_l)
        member = np.isin(lf[left_key].to_numpy(zero_copy_only=False), rk)
        out = lf.filter(pa.array(~member if anti else member))
        return out.drop_columns(["_bkt", "_side"])

    return tagged.groupby("_bkt").map_groups(probe_bucket, batch_format="pyarrow")
