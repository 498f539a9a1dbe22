"""Exact distributed quantiles over discrete-domain columns.

Strategy (scale-first): a ``groupby(value).count()`` collapses the row
count N down to the *value domain* |V| — for discrete columns (doc
lengths, token counts, status codes, bucketed floats) |V| is thousands
even when N is 10^12, so the cumulative-sum + select step is a
driver-side O(|V| log |V|) on a tiny table while all N rows stream
through one combiner-style aggregate shuffle. No sort of the data, no
driver materialization of rows.

For genuinely continuous columns quantize first (``quantize=...``
decimal digits) — the result is then exact for the quantized values
(equivalently: exact quantiles of ``round(x, d)``), which is what an
oracle can also compute.

Selection semantics match DuckDB's ``quantile_disc`` exactly (probed:
``idx = max(0, ceil(q*n) - 1)`` into the ascending value order, double
arithmetic), so results are hash-verifiable against SQL.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _disc_index(q: float, n: int) -> int:
    """DuckDB quantile_disc element index for quantile ``q`` of ``n`` rows."""
    return max(0, math.ceil(q * n) - 1)


def _select_from_counts(
    values: np.ndarray, counts: np.ndarray, qs: list[float]
) -> list:
    order = np.argsort(values, kind="stable")
    v = values[order]
    c = counts[order].astype(np.int64)
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append(None)
            continue
        idx = _disc_index(q, n)
        # first value whose cumulative count exceeds idx
        pos = int(np.searchsorted(cum, idx + 1, side="left"))
        out.append(v[pos])
    return out


def exact_quantiles(
    ds,
    column: str,
    qs: list[float],
    quantize: int | None = None,
) -> pd.DataFrame:
    """Exact quantile_disc values of ``column`` over a Ray Dataset.

    Returns a DataFrame ``(q, value)`` with one row per requested
    quantile. The heavy pass is ``map_batches`` partial value counts +
    one ``groupby(value).sum()`` shuffle whose cardinality is the value
    domain, not the row count.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial_counts(b: "pa.Table") -> "pa.Table":
        arr = b[column].combine_chunks()
        x = arr.to_numpy(zero_copy_only=False)
        x = x[~pd.isna(x)]
        if quantize is not None:
            x = np.round(x.astype(np.float64), quantize)
        vals, cnts = np.unique(x, return_counts=True)
        return pa.table({"v": pa.array(vals), "n_part": pa.array(cnts, pa.int64())})

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    sel = _select_from_counts(
        counts["v"].to_numpy(), counts["n"].to_numpy(), qs
    )
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"), "value": sel})


def grouped_quantiles(
    ds,
    key: str,
    column: str,
    qs: list[float],
    quantize: int | None = None,
) -> pd.DataFrame:
    """Per-group exact quantile_disc: one (key, value) count shuffle,
    then the tiny per-group select on the driver. Output: (``key``, q,
    value) sorted by (key, q)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial_counts(b: "pa.Table") -> "pa.Table":
        k = b[key].to_pandas()
        x = b[column].to_pandas()
        mask = ~(k.isna() | x.isna())
        k, x = k[mask], x[mask].to_numpy()
        if quantize is not None:
            x = np.round(x.astype(np.float64), quantize)
        g = pd.DataFrame({"k": k.to_numpy(), "v": x}).groupby(
            ["k", "v"], sort=False
        ).size()
        idx = g.index.to_frame(index=False)
        return pa.table(
            {
                key: pa.array(idx["k"]),
                "v": pa.array(idx["v"]),
                "n_part": pa.array(g.to_numpy(), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby([key, "v"])
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for kval, sub in counts.groupby(key, sort=True):
        sel = _select_from_counts(sub["v"].to_numpy(), sub["n"].to_numpy(), qs)
        for q, val in zip(qs, sel):
            rows.append((kval, q, val))
    return pd.DataFrame(rows, columns=[key, "q", "value"]).sort_values(
        [key, "q"]
    ).reset_index(drop=True)


def _cont_from_counts(
    values: np.ndarray, counts: np.ndarray, qs: list[float]
) -> list:
    """DuckDB ``quantile_cont`` (linear interpolation at ``q·(n-1)``)
    evaluated from a (value, count) domain table — same distributed
    shape as the disc variant, interpolation is two searchsorted hits."""
    order = np.argsort(values, kind="stable")
    v = values[order].astype(np.float64)
    c = counts[order].astype(np.int64)
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append(None)
            continue
        pos = q * (n - 1)
        lo = int(math.floor(pos))
        hi = min(lo + 1, n - 1)
        frac = pos - lo
        vlo = v[int(np.searchsorted(cum, lo + 1, side="left"))]
        vhi = v[int(np.searchsorted(cum, hi + 1, side="left"))]
        out.append(vlo + frac * (vhi - vlo))
    return out


def exact_quantiles_cont(
    ds,
    column: str,
    qs: list[float],
    quantize: int | None = None,
) -> pd.DataFrame:
    """Exact ``quantile_cont`` (interpolated) values of ``column`` — the
    same value-domain count shuffle as :func:`exact_quantiles`, with
    linear interpolation in the driver-side select."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial_counts(b: "pa.Table") -> "pa.Table":
        arr = b[column].combine_chunks()
        x = arr.to_numpy(zero_copy_only=False)
        x = x[~pd.isna(x)]
        if quantize is not None:
            x = np.round(x.astype(np.float64), quantize)
        vals, cnts = np.unique(x, return_counts=True)
        return pa.table({"v": pa.array(vals), "n_part": pa.array(cnts, pa.int64())})

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    sel = _cont_from_counts(counts["v"].to_numpy(), counts["n"].to_numpy(), qs)
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"), "value": sel})
