"""Deterministic sampling + selection operators for training-data curation.

``hash_sample`` / ``stratified_sample``: reproducible row sampling by a
multiplicative hash of a key column — the standard way to cut a
training corpus to a fixed fraction (or per-stratum fractions, e.g.
downsample the dominant language) such that every run, every engine,
and every rerun of a failed shard selects the SAME rows. The hash is
``(key * 2654435761) mod 2^32`` (Knuth's multiplicative constant) —
chosen over a cryptographic hash because it is exactly reproducible in
one numpy multiply per batch AND in plain SQL arithmetic (the DuckDB
oracle recomputes it bit-for-bit), with no per-row Python.

``group_topk``: keep the best k rows per group (top documents per
language/domain — the "quality ceiling per source" curation step).
Composition: per-batch partial top-k per group (combiner — only
``k × groups_per_batch`` rows enter the shuffle) → ONE
``groupby(group)`` shuffle → exact per-group top-k + rank. Ordering is
(order_col desc/asc, tie_col asc) — fully deterministic.

Scale notes: sampling is stateless/streaming (no shuffle at all);
group_topk's shuffle moves at most ``k`` rows per (group, input block),
so skew is bounded by k × n_blocks, not group size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

KNUTH = np.uint64(2654435761)
MASK32 = np.uint64(0xFFFFFFFF)


def _hash_pct(keys: np.ndarray) -> np.ndarray:
    """(key * 2654435761) mod 2^32, mod 100 → uniform 0..99 per key."""
    h = (keys.astype(np.uint64) * KNUTH) & MASK32
    return (h % np.uint64(100)).astype(np.int64)


def hash_sample(ds, key_col: str, pct: int):
    """Keep rows where hash(key) mod 100 < pct (deterministic ~pct% sample)."""

    def f(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(_hash_pct(keys) < pct))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds, key_col: str, strata_col: str, rates: dict[str, int], default_pct: int = 0):
    """Per-stratum deterministic sampling: keep a row iff
    ``hash(key) mod 100 < rates[stratum]`` (``default_pct`` for strata
    not in ``rates``). ``rates`` maps stratum value → integer percent."""

    def f(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        strata = b[strata_col].to_pandas()
        cut = strata.map(rates).fillna(default_pct).to_numpy(dtype=np.int64)
        return b.filter(pa.array(_hash_pct(keys) < cut))

    return ds.map_batches(f, batch_format="pyarrow")


def group_topk(
    ds,
    group_col: str,
    order_col: str,
    tie_col: str,
    k: int,
    ascending: bool = False,
):
    """Top-k rows per group by (order_col, tie_col), with a 1-based
    ``rank`` column. Per-batch partial top-k first (combiner), then one
    shuffle for the exact cut."""
    # Arrow-native combiner + reducer (round-5): ``Table.sort_by``
    # handles any key type natively; the per-group head is a run-length
    # position mask over the sorted group column. Arrow blocks keep
    # their schema when empty, so no eager ``ds.schema()`` is needed
    # (the old pandas version's typed-empty-frame workaround triggered
    # partial upstream execution just to learn dtypes).
    import pyarrow.compute as pc

    sort_keys = [
        (group_col, "ascending"),
        (order_col, "ascending" if ascending else "descending"),
        (tie_col, "ascending"),
    ]

    def _head_mask(col, limit: int) -> np.ndarray:
        """pos-within-contiguous-run < limit, for an already-sorted col."""
        n = len(col)
        a = col.combine_chunks()
        neq = pc.not_equal(a.slice(1), a.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(np.r_[True, neq])
        counts = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        return pos < limit

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t  # an empty Arrow block keeps its typed schema
        t = t.sort_by(sort_keys)
        return t.filter(pa.array(_head_mask(t[group_col], k)))

    def final(g: pa.Table) -> pa.Table:
        g = g.sort_by(sort_keys).slice(0, k)
        return g.append_column(
            "rank", pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64))
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )
