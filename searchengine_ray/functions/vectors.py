"""Vector-column aggregations for embedding tables.

``group_centroids``: per-group mean embedding — the building block of
k-means-style curation (cluster balance checks, per-source centroid
drift, near-centroid filtering). Combiner pattern: each batch collapses
to one (group → sum-vector, count) row set inside ``map_batches`` (a
numpy ``np.add.reduceat`` over the sorted group order), so the shuffle
moves one vector per (group, batch) — never one per row. The division
happens once on the tiny aggregated table.

Output is long-form (group, dim, c) with ``c`` rounded, which is what a
SQL oracle can compute by zipping ``unnest``/``generate_subscripts``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_partial(batch: pa.Table, key: str, vector_column: str) -> pa.Table:
    arr = batch[vector_column].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    empty = pa.table(
        {
            key: pa.array([], batch[key].type),
            "sums": pa.array([], pa.list_(pa.float64())),
            "n_part": pa.array([], pa.int64()),
        }
    )
    if isinstance(arr, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        if isinstance(arr, pa.FixedSizeListArray):
            dim = arr.type.list_size
            widths = np.full(len(arr), dim, np.int64)
            flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            widths = np.diff(offs)
            flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        if len(widths) == 0:
            return empty
        dim = int(widths[0])
        if not (widths == dim).all():
            raise ValueError("ragged embedding column")
        mat = flat.reshape(-1, dim)
    else:
        # Ray tensor-extension column (from_pandas of ndarray cells) —
        # already a fixed-shape (n, dim) block
        mat = np.asarray(arr.to_numpy(zero_copy_only=False)).astype(np.float64)
        if mat.ndim == 1:  # object fallback: ragged rows
            raise ValueError("ragged embedding column")
        if mat.size == 0:
            return empty
    keys = batch[key].to_pandas().to_numpy()
    order = np.argsort(keys, kind="stable")
    keys_s = keys[order]
    boundaries = np.flatnonzero(np.r_[True, keys_s[1:] != keys_s[:-1]])
    sums = np.add.reduceat(mat[order], boundaries, axis=0)
    cnts = np.diff(np.r_[boundaries, len(keys_s)])
    return pa.table(
        {
            key: pa.array(keys_s[boundaries]),
            "sums": pa.array(list(sums), pa.list_(pa.float64())),
            "n_part": pa.array(cnts, pa.int64()),
        }
    )


def group_centroids(
    ds, key: str, vector_column: str = "embedding", ndigits: int = 6
) -> pd.DataFrame:
    """Per-group mean vector, long-form (``key``, dim, c) sorted by
    (key, dim). One combiner shuffle of (group × batch) partial sums."""

    def partial(b: pa.Table) -> pa.Table:
        return _batch_partial(b, key, vector_column)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        total = np.sum(np.stack(g["sums"].to_numpy()), axis=0)
        n = int(g["n_part"].sum())
        c = np.round(total / n, ndigits)
        return pd.DataFrame(
            {
                key: np.repeat(g[key].iloc[0], len(c)),
                "dim": np.arange(1, len(c) + 1, dtype=np.int64),
                "c": c,
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values([key, "dim"]).reset_index(drop=True)
