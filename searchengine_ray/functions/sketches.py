"""Streaming sketches for corpus-scale statistics: exact-verified heavy
hitters and a deterministic HyperLogLog.

Both are built so a SQL oracle can verify them EXACTLY:

- **Heavy hitters** uses per-partition candidate compression (keep the
  top ``capacity`` terms by exact local count) followed by an exact
  broadcast-filtered counting pass, so the final top-k is *provably
  exact*, not approximate: a term omitted from a partition's candidate
  list has local count ≤ (partition tokens)/capacity, so any term with
  global count > (total tokens)/capacity survives into the candidate
  union (the Misra-Gries bound). The exact pass then establishes real
  counts for candidates only — the whole vocabulary never shuffles.
  The result carries a runtime guarantee check: if the k-th candidate
  count falls below the pruning bound the function falls back to the
  full groupby (never silently wrong).

- **HyperLogLog** (p-bit register HLL, Flajolet et al. 2007) hashes with
  md5-lower-64 — the same DuckDB-mirrorable hash the SimHash dedup path
  uses — and exposes the *integer register table* (register, rho), so
  correctness is exact integer equality, with the float estimate
  derived from the registers on both sides. rho is computed without
  floats: rho = (64 - p + 1) - bit_length(w), string-exact in SQL via
  ``length(bin(w))``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# ------------------------------------------------------------ heavy hitters


_TOTAL_SENTINEL = "\x00total"  # tokenizer never emits NUL-prefixed terms


def _top_terms_batch(batch: pa.Table, text_column: str, capacity: int) -> pa.Table:
    """Per-batch exact term counts, truncated to the ``capacity`` most
    frequent (ties kept: truncation is by count threshold, so the
    Misra-Gries omission bound holds per batch), plus one sentinel row
    carrying the batch token total (for the exactness certificate)."""
    from .textstats import _token_lists

    toks = _token_lists(batch[text_column].to_pandas())
    flat = np.concatenate([t for t in toks if len(t)]) if len(toks) else np.array([], object)
    total = int(flat.size)
    if total == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
        )
    terms, counts = np.unique(flat, return_counts=True)
    if len(terms) > capacity:
        thresh = np.partition(counts, len(counts) - capacity)[len(counts) - capacity]
        keep = counts >= thresh
        terms, counts = terms[keep], counts[keep]
    return pa.table(
        {
            "term": pa.array(np.concatenate([terms, [_TOTAL_SENTINEL]]), pa.string()),
            "c": pa.array(np.concatenate([counts, [total]]), pa.int64()),
        }
    )


def heavy_hitters(
    ds,
    top_k: int = 30,
    capacity: int = 2048,
    text_column: str = "text",
) -> pd.DataFrame:
    """Exact top-k terms by total occurrences across the corpus.

    Two passes, both streaming:
      1. candidate sweep — per-batch top-``capacity`` local counts,
         groupby(term).sum over candidates only (vocabulary never
         shuffles whole),
      2. exact pass — only needed when the Misra-Gries bound cannot
         certify pass-1 counts as exact; with per-batch exact counts the
         pass-1 sum for any term that made EVERY batch's candidate list
         is already exact, so we recount (broadcast-filtered) just the
         top candidates to remove truncation undercount.

    Returns (term, n) sorted by n desc, term asc — provably equal to the
    full groupby (falls back to it if the certificate fails).
    """
    import ray
    from ray.data.aggregate import Sum

    cand = (
        ds.map_batches(
            lambda b: _top_terms_batch(b, text_column, capacity),
            batch_format="pyarrow",
        )
        .groupby("term")
        .aggregate(Sum("c", alias_name="n_lower"))
        .to_pandas()
    )
    total_tokens = int(cand.loc[cand["term"] == _TOTAL_SENTINEL, "n_lower"].sum())
    cand = cand[cand["term"] != _TOTAL_SENTINEL]
    if cand.empty:
        return pd.DataFrame({"term": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")})

    # candidates to recount exactly: generous margin over top_k so the
    # certificate below almost always holds on Zipf-ish corpora
    cand = cand.sort_values(["n_lower", "term"], ascending=[False, True])
    recount = set(cand["term"].head(max(top_k * 4, 128)).tolist())
    ref = ray.put(recount)

    def exact_counts(batch: pa.Table, _ref=ref) -> pa.Table:
        from .textstats import _token_lists

        wanted = ray.get(_ref)
        toks = _token_lists(batch[text_column].to_pandas())
        flat = (
            np.concatenate([t for t in toks if len(t)])
            if len(toks)
            else np.array([], object)
        )
        if flat.size == 0:
            return pa.table({"term": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        terms, counts = np.unique(flat, return_counts=True)
        mask = np.fromiter((t in wanted for t in terms), bool, len(terms))
        return pa.table(
            {"term": pa.array(terms[mask], pa.string()),
             "c": pa.array(counts[mask], pa.int64())}
        )

    exact = (
        ds.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "term"], ascending=[False, True])
        .reset_index(drop=True)
    )
    # Misra-Gries certificate. Any term's true count ≤ its pass-1 lower
    # bound + total_tokens/capacity (omitted-from-a-batch undercount is
    # ≤ batch_tokens/capacity per batch, summed ≤ total/capacity; a term
    # outside the candidate union has lower bound 0). So the top-k is
    # provably exact iff the k-th recounted count beats the best possible
    # true count of anything we did NOT recount.
    excluded_lower_max = (
        int(cand["n_lower"].iloc[len(recount)]) if len(cand) > len(recount) else 0
    )
    bound_ok = len(exact) >= top_k and int(exact["n"].iloc[top_k - 1]) > (
        excluded_lower_max + total_tokens // capacity
    )
    if not bound_ok:
        from .textstats import _token_lists  # full exact fallback

        def all_counts(batch: pa.Table) -> pa.Table:
            toks = _token_lists(batch[text_column].to_pandas())
            flat = (
                np.concatenate([t for t in toks if len(t)])
                if len(toks)
                else np.array([], object)
            )
            terms, counts = (
                np.unique(flat, return_counts=True)
                if flat.size
                else (np.array([], object), np.array([], np.int64))
            )
            return pa.table(
                {"term": pa.array(terms, pa.string()), "c": pa.array(counts, pa.int64())}
            )

        exact = (
            ds.map_batches(all_counts, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("c", alias_name="n"))
            .to_pandas()
            .sort_values(["n", "term"], ascending=[False, True])
            .reset_index(drop=True)
        )
    return exact.head(top_k).reset_index(drop=True).astype({"n": "int64"})


# ------------------------------------------------------------- HyperLogLog

HLL_P = 12  # 4096 registers


def _md5_lower64_ints(values: np.ndarray) -> np.ndarray:
    """md5-lower-64 of the decimal-string form of each value (matches
    DuckDB ``md5_number_lower(CAST(v AS VARCHAR))``)."""
    import hashlib

    out = np.empty(len(values), np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
    return out


def hll_register_batch(batch: pa.Table, column: str, p: int = HLL_P) -> pa.Table:
    """Per-batch partial registers: (register, rho) with the batch-local
    max rho per register — merged downstream with a Max groupby."""
    vals = batch[column].to_numpy(zero_copy_only=False)
    h = _md5_lower64_ints(vals)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rho = leading zeros in the (64-p)-bit window + 1 = (64-p+1) - bit_length(w).
    # bit_length via frexp: w < 2^52 is exactly representable in float64,
    # and frexp returns w = m·2^e with m ∈ [0.5, 1), so e == bit_length(w).
    _, bl = np.frexp(w.astype(np.float64))
    rho = (64 - p + 1) - bl.astype(np.int64)  # w == 0 → frexp e == 0 → rho = 53 ✓
    df = pd.DataFrame({"register": reg, "rho": rho})
    part = df.groupby("register", as_index=False)["rho"].max()
    return pa.table(
        {
            "register": pa.array(part["register"].to_numpy(np.int64), pa.int64()),
            "rho": pa.array(part["rho"].to_numpy(np.int64), pa.int64()),
        }
    )


def hll_registers(ds, column: str, p: int = HLL_P) -> pd.DataFrame:
    """Distributed HLL register table: per-batch partial max-rho (tiny
    combiner output: ≤2^p rows per batch) → groupby(register).max.
    Returns (register, rho) for non-empty registers, integer-exact."""
    from ray.data.aggregate import Max

    out = (
        ds.map_batches(
            lambda b: hll_register_batch(b, column, p), batch_format="pyarrow"
        )
        .groupby("register")
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
        .sort_values("register")
        .reset_index(drop=True)
    )
    return out.astype({"register": "int64", "rho": "int64"})


def hll_estimate(registers: pd.DataFrame, p: int = HLL_P) -> float:
    """Standard HLL estimate from a (register, rho) table (empty
    registers implicit): alpha_m·m²/Σ2^-M with the small-range
    linear-counting correction."""
    m = 1 << p
    rho = np.zeros(m, np.int64)
    rho[registers["register"].to_numpy(np.int64)] = registers["rho"].to_numpy(np.int64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -rho.astype(np.float64)))
    zeros = int((rho == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)


def grouped_hll_registers(ds, key: str, column: str, p: int = HLL_P) -> pd.DataFrame:
    """Per-group HLL register tables in one shuffle: per-batch partial
    max-rho per (key, register) — ≤ groups·2^p rows per batch — then a
    Max groupby. The mergeable-sketch shape for distinct-count over any
    slicing (per day, per shard, per source): merging two groups is the
    same Max, so windowed or hierarchical rollups never rescan data."""
    from ray.data.aggregate import Max

    def partial(b: pa.Table) -> pa.Table:
        vals = b[column].to_numpy(zero_copy_only=False)
        h = _md5_lower64_ints(vals)
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - p)) - 1)
        _, bl = np.frexp(w.astype(np.float64))
        rho = (64 - p + 1) - bl.astype(np.int64)
        df = pd.DataFrame({key: b[key].to_pandas(), "register": reg, "rho": rho})
        part = df.groupby([key, "register"], as_index=False)["rho"].max()
        return pa.Table.from_pandas(part, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key, "register"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
        .sort_values([key, "register"])
        .reset_index(drop=True)
    )
    return out.astype({"register": "int64", "rho": "int64"})


# ------------------------------------------------------------- Bloom filter

BLOOM_M = 16384  # bits
BLOOM_K = 2  # hash functions (derived from one md5-lower-64)


def bloom_bits_batch(batch: pa.Table, column: str, m: int = BLOOM_M, k: int = BLOOM_K) -> pa.Table:
    """Per-batch partial Bloom bit positions (batch-local distinct —
    ≤ min(k·|batch|, m) rows through the shuffle). The j-th hash is a
    20j-bit shift of md5-lower-64 mod m, exactly mirrorable in SQL as
    ``(md5_number_lower(CAST(v AS VARCHAR)) >> 20j) % m``."""
    vals = batch[column].to_numpy(zero_copy_only=False)
    h = _md5_lower64_ints(vals)
    parts = [((h >> np.uint64(20 * j)) % np.uint64(m)).astype(np.int64) for j in range(k)]
    u = np.unique(np.concatenate(parts)) if parts else np.array([], np.int64)
    return pa.table({"bit": pa.array(u, pa.int64())})


def bloom_bits(ds, column: str, m: int = BLOOM_M, k: int = BLOOM_K) -> pd.DataFrame:
    """Distributed Bloom-filter build: the sketch IS the sorted distinct
    bit-position table (integer-exact, like the HLL register table), so
    cross-engine correctness is exact equality; the membership/FP
    behavior is derived from it (see :func:`bloom_probe`)."""
    from ray.data.aggregate import Count

    out = (
        ds.map_batches(lambda b: bloom_bits_batch(b, column, m, k), batch_format="pyarrow")
        .groupby("bit")
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
        .sort_values("bit")
        .reset_index(drop=True)
    )
    return out[["bit"]].astype({"bit": "int64"})


def bloom_probe(bits: pd.DataFrame, values: np.ndarray, m: int = BLOOM_M, k: int = BLOOM_K) -> np.ndarray:
    """Membership test against a built bit table: True iff every hash
    bit is set — no false negatives by construction."""
    mask = np.zeros(m, bool)
    mask[bits["bit"].to_numpy(np.int64)] = True
    h = _md5_lower64_ints(values)
    ok = np.ones(len(values), bool)
    for j in range(k):
        ok &= mask[((h >> np.uint64(20 * j)) % np.uint64(m)).astype(np.int64)]
    return ok


# --------------------------------------------------------- count-min sketch

CMS_W = 1024  # columns
CMS_D = 3  # rows (derived hashes)


def cms_batch(batch: pa.Table, column: str, w: int = CMS_W, d: int = CMS_D) -> pa.Table:
    """Per-batch partial count-min cells: (row, col, n) with batch-local
    counts — ≤ d·w rows per batch through the shuffle regardless of
    batch size (the combiner shape every mergeable sketch shares)."""
    vals = batch[column].to_numpy(zero_copy_only=False)
    h = _md5_lower64_ints(vals)
    rows, cols, ns = [], [], []
    for j in range(d):
        col = ((h >> np.uint64(20 * j)) % np.uint64(w)).astype(np.int64)
        cnt = np.bincount(col, minlength=w)
        nz = np.flatnonzero(cnt)
        rows.append(np.full(len(nz), j, np.int64))
        cols.append(nz.astype(np.int64))
        ns.append(cnt[nz].astype(np.int64))
    return pa.table(
        {
            "row": pa.array(np.concatenate(rows), pa.int64()),
            "col": pa.array(np.concatenate(cols), pa.int64()),
            "n": pa.array(np.concatenate(ns), pa.int64()),
        }
    )


def cms_counts(ds, column: str, w: int = CMS_W, d: int = CMS_D) -> pd.DataFrame:
    """Distributed count-min sketch: the sketch is the integer (row,
    col, count) cell table — Sum-mergeable, integer-exact vs the SQL
    mirror. Point estimates (min over rows — never an underestimate)
    derive from it via :func:`cms_estimate`."""
    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(lambda b: cms_batch(b, column, w, d), batch_format="pyarrow")
        .groupby(["row", "col"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    return out.astype({"row": "int64", "col": "int64", "n": "int64"})


def cms_estimate(cells: pd.DataFrame, values: np.ndarray, w: int = CMS_W, d: int = CMS_D) -> np.ndarray:
    """Count-min point estimates: min over the d cells each value hashes
    to. By construction >= the true count (one-sided error)."""
    table = np.zeros((d, w), np.int64)
    table[cells["row"].to_numpy(np.int64), cells["col"].to_numpy(np.int64)] = cells[
        "n"
    ].to_numpy(np.int64)
    h = _md5_lower64_ints(values)
    est = np.full(len(values), np.iinfo(np.int64).max, np.int64)
    for j in range(d):
        col = ((h >> np.uint64(20 * j)) % np.uint64(w)).astype(np.int64)
        est = np.minimum(est, table[j, col])
    return est
