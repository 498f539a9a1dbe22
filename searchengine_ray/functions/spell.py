"""Spelling suggestion over the index term dictionary.

``suggest_terms``: the k dictionary terms closest to a query word by
plain unit-cost Levenshtein distance (ties: higher df, then term).
The scan is Dataset-native over the term-sorted shard dictionaries —
``block_id == 0`` rows only (one per term per shard), columns pruned to
(term, df), so at 10^12 docs this reads the vocabulary, never a
posting. The distance kernel is a numpy-vectorized DP: all terms in a
batch advance one DP column per step (terms become a fixed-width
uint32 codepoint matrix via numpy's 'U' dtype view), so cost is
O(max_len · |query|) vector ops per batch, no per-term Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def levenshtein_batch(terms: np.ndarray, query: str) -> np.ndarray:
    """Unit-cost Levenshtein distance from every term to ``query``,
    vectorized across terms (semantics identical to DuckDB's
    ``levenshtein``)."""
    n = len(terms)
    if n == 0:
        return np.empty(0, np.int32)
    m = len(query)
    u = np.asarray(terms, dtype="U")  # fixed-width unicode matrix
    width = u.dtype.itemsize // 4
    if width == 0:  # all terms empty
        return np.full(n, m, np.int32)
    mat = u.view(np.uint32).reshape(n, width)
    lens = (mat != 0).sum(axis=1).astype(np.int64)
    qc = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    out = np.full(n, m, np.int32)  # distance for zero-length terms
    # dp[i, j] = distance between term i's first `step` chars and query[:j]
    dp = np.tile(np.arange(m + 1, dtype=np.int32), (n, 1))
    for step in range(1, int(lens.max()) + 1):
        cur = np.empty_like(dp)
        cur[:, 0] = step
        ch = mat[:, step - 1]
        for j in range(1, m + 1):
            sub = dp[:, j - 1] + (ch != qc[j - 1])
            cur[:, j] = np.minimum(np.minimum(dp[:, j] + 1, cur[:, j - 1] + 1), sub)
        dp = cur
        done = lens == step
        if done.any():
            out[done] = dp[done, m]
    return out


def suggest_terms(
    index_dir, word: str, max_dist: int = 2, k: int = 5
) -> pd.DataFrame:
    """Top-k correction candidates for ``word`` from an index's
    dictionary: (term, df, dist) ordered by (dist, -df, term).

    Runs as a Ray Dataset pipeline over the shard dictionary rows; the
    per-batch filter keeps ≤ max_dist candidates so only a handful of
    rows ever reach the driver."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data as rd

    from ..build.manifest import IndexManifest

    manifest = IndexManifest.load(index_dir)
    files = []
    for gen in manifest.generations:
        files.extend(sorted(str(p) for p in (index_dir / gen).glob("shard=*.parquet")))
    ds = rd.read_parquet(
        files,
        columns=["term", "df"],
        filter=pads.field("block_id") == 0,
    )

    def candidates(b: pa.Table) -> pa.Table:
        terms = np.asarray(b["term"].to_pylist(), dtype=object)
        dist = levenshtein_batch(terms, word)
        keep = dist <= max_dist
        return pa.table(
            {
                "term": pa.array(terms[keep], pa.string()),
                "df_part": b["df"].combine_chunks().take(
                    pa.array(np.flatnonzero(keep), pa.int64())
                ),
                "dist": pa.array(dist[keep], pa.int32()),
            }
        )

    from ray.data.aggregate import Max, Sum

    out = (
        ds.map_batches(candidates, batch_format="pyarrow")
        # df sums across generations / salted subsets; dist is identical
        # on every copy of a term
        .groupby("term")
        .aggregate(Sum("df_part", alias_name="df"), Max("dist", alias_name="dist"))
        .to_pandas()
    )
    out = out.sort_values(
        ["dist", "df", "term"], ascending=[True, False, True]
    ).head(k)
    return out[["term", "df", "dist"]].astype(
        {"df": "int64", "dist": "int64"}
    ).reset_index(drop=True)
