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

    # exact output dtypes: the union null-pads each side's payload, so a
    # pandas block sees float64 + NaN — restore the true types after the
    # match filter (and emit empty buckets with the same schema)
    out_dtypes = {
        by: l_schema[by].to_pandas_dtype(),
        on: l_schema[on].to_pandas_dtype(),
        **{c: t.to_pandas_dtype() for c, t in l_types.items()},
        **{cr: r_types[c].to_pandas_dtype() for c, cr in zip(right_cols, r_out)},
    }
    out_cols = [by, on] + left_cols + r_out

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0].sort_values(on, kind="mergesort")[[by, on] + left_cols]
        rf = g[g["_side"] == 1].sort_values(on, kind="mergesort")[[by, on] + r_out]
        rf = rf.assign(_m=np.int8(1))
        if not len(lf) or not len(rf):
            out = lf.iloc[0:0].assign(**{c: None for c in r_out})
        else:
            out = pd.merge_asof(lf, rf, on=on, by=by, direction=direction)
            out = out[out["_m"].notna()]
        return (
            out[out_cols].astype(out_dtypes, copy=False).reset_index(drop=True)
        )

    return unioned.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")
