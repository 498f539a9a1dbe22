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


def _extract_matrix(arr) -> np.ndarray | None:
    """(n, dim) float64 matrix from a list / fixed-size-list / tensor
    column; None when the batch is empty. Raises on ragged rows."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
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
            return None
        dim = int(widths[0])
        if not (widths == dim).all():
            raise ValueError("ragged embedding column")
        return flat.reshape(-1, dim)
    # Ray tensor-extension column (from_pandas of ndarray cells) —
    # already a fixed-shape (n, dim) block
    mat = np.asarray(arr.to_numpy(zero_copy_only=False)).astype(np.float64)
    if mat.ndim == 1:  # object fallback: ragged rows
        raise ValueError("ragged embedding column")
    if mat.size == 0:
        return None
    return mat


def _batch_partial(batch: pa.Table, key: str, vector_column: str) -> pa.Table:
    arr = batch[vector_column].combine_chunks()
    empty = pa.table(
        {
            key: pa.array([], batch[key].type),
            "sums": pa.array([], pa.list_(pa.float64())),
            "n_part": pa.array([], pa.int64()),
        }
    )
    mat = _extract_matrix(arr)
    if mat is None:
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

    def combine(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): flatten the list column once
        # (zero-copy) instead of stacking per-row Python objects.
        lv = g["sums"].combine_chunks()
        mat = lv.flatten().to_numpy(zero_copy_only=False).reshape(g.num_rows, -1)
        total = np.sum(mat, axis=0)
        n = int(g["n_part"].to_numpy(zero_copy_only=False).sum())
        c = np.round(total / n, ndigits)
        return pa.table(
            {
                key: pa.array([g[key][0].as_py()] * len(c), g[key].type),
                "dim": pa.array(np.arange(1, len(c) + 1, dtype=np.int64)),
                "c": pa.array(c, pa.float64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(combine, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values([key, "dim"]).reset_index(drop=True)


def _l2_assign(mat: np.ndarray, cent: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """Nearest centroid by squared L2, ties broken toward the lowest
    cluster index (``argmin`` semantics — mirrors the SQL oracle's
    ``ORDER BY list_distance, c``). Explicit ``(x-c)**2`` differences,
    not the ``x²-2xc+c²`` expansion, so the float path matches what a
    SQL engine computes term-by-term."""
    out = np.empty(len(mat), np.int64)
    for lo in range(0, len(mat), chunk):
        x = mat[lo : lo + chunk]
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        out[lo : lo + chunk] = d.argmin(axis=1)
    return out


def kmeans_fit(
    ds,
    k: int = 8,
    iters: int = 3,
    id_column: str = "vec_id",
    emb_column: str = "embedding",
    round_digits: int = 6,
):
    """Distributed Lloyd's k-means over an embedding Dataset.

    Deterministic, SQL-mirrorable contract:

    - **init**: the vectors of the ``k`` smallest ids (each batch emits
      its local k smallest — a combiner, never a full sort),
    - **assignment**: L2 argmin, ties to the lowest cluster index,
    - **update**: per-dimension mean **rounded to** ``round_digits``
      (the cross-engine determinism device: 1e-16 summation-order noise
      cannot survive the rounding); an empty cluster keeps its previous
      centroid,
    - ``iters`` assignment passes, ``iters - 1`` updates (the last
      assignment is the returned labelling).

    Each pass is one ``map_batches`` emitting per-batch partial
    ``(cluster, count, sumvec)`` rows — ≤ k rows per batch reach the
    driver, never anything row-sized. The final pass emits the
    assignments as a Dataset, so the labelling itself stays distributed.

    Returns ``(centroids (k, dim) float64, assignments Dataset with
    columns (id_column, cluster))``.
    """
    import ray

    def local_mink(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _extract_matrix(batch[emb_column].combine_chunks())
        if mat is None:
            return pa.table(
                {id_column: pa.array([], pa.int64()),
                 "v": pa.array([], pa.list_(pa.float64()))}
            )
        take = np.argsort(ids, kind="stable")[:k]
        return pa.table(
            {id_column: pa.array(ids[take], pa.int64()),
             "v": pa.array(list(mat[take]), pa.list_(pa.float64()))}
        )

    seed = ds.map_batches(local_mink, batch_format="pyarrow").to_pandas()
    seed = seed.sort_values(id_column, kind="mergesort").head(k)
    cent = np.stack(seed["v"].to_numpy()).astype(np.float64)
    if len(cent) < k:
        raise ValueError(f"k={k} but only {len(cent)} vectors")

    for _ in range(iters - 1):
        cref = ray.put(cent)

        def partials(batch: pa.Table, _c=cref) -> pa.Table:
            c = ray.get(_c)
            mat = _extract_matrix(batch[emb_column].combine_chunks())
            if mat is None:
                return pa.table(
                    {"cluster": pa.array([], pa.int64()),
                     "sums": pa.array([], pa.list_(pa.float64())),
                     "n_part": pa.array([], pa.int64())}
                )
            lab = _l2_assign(mat, c)
            order = np.argsort(lab, kind="stable")
            lab_s = lab[order]
            bounds = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
            sums = np.add.reduceat(mat[order], bounds, axis=0)
            cnts = np.diff(np.r_[bounds, len(lab_s)])
            return pa.table(
                {"cluster": pa.array(lab_s[bounds], pa.int64()),
                 "sums": pa.array(list(sums), pa.list_(pa.float64())),
                 "n_part": pa.array(cnts, pa.int64())}
            )

        part = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
        new = cent.copy()
        for c, grp in part.groupby("cluster"):
            total = np.sum(np.stack(grp["sums"].to_numpy()), axis=0)
            new[int(c)] = np.round(total / int(grp["n_part"].sum()), round_digits)
        cent = new

    cref = ray.put(cent)

    def assign(batch: pa.Table, _c=cref) -> pa.Table:
        c = ray.get(_c)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _extract_matrix(batch[emb_column].combine_chunks())
        if mat is None:
            return pa.table(
                {id_column: pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int64())}
            )
        return pa.table(
            {id_column: pa.array(ids, pa.int64()),
             "cluster": pa.array(_l2_assign(mat, c), pa.int64())}
        )

    return cent, ds.map_batches(assign, batch_format="pyarrow")
