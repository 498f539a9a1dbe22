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
    sort_cols = [group_col, order_col, tie_col]
    sort_asc = [True, ascending, True]
    # typed empty frame so empty blocks/groups keep the output schema
    # (Arrow-block schemas carry pyarrow types, pandas-block schemas
    # carry numpy dtypes — accept both)
    schema = ds.schema()
    empty = pd.DataFrame(
        {
            n: pd.Series([], dtype=t.to_pandas_dtype() if hasattr(t, "to_pandas_dtype") else t)
            for n, t in zip(schema.names, schema.types)
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty.copy()
        return (
            df.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
            .groupby(group_col, sort=False)
            .head(k)
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            out = empty.copy()
            out["rank"] = pd.Series([], dtype="int64")
            return out
        out = (
            g.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
            .head(k)
            .reset_index(drop=True)
        )
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
    )
