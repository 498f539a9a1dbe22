"""Postings construction: explode per-doc term vectors into posting rows and
reduce each hash shard into sorted, delta+varbyte-compressed posting blocks
with block-max metadata.

This is the Ray-native replacement for the reference's in-memory
``TreeMap`` accumulation + LSM flush/merge machinery
(``InvertedIndex.java:1129-1143`` accumulate, ``:816-975`` flush,
``:567-626`` merge): the ``groupby(shard)`` shuffle IS the accumulation and
the merge (SURVEY.md §3.1 "Ray-native restructuring").

Layout per shard (``postings/shard=NNNNN.parquet``), one row per posting
block (head terms split into blocks of ``block_size`` docs — explicit skew
handling, north_rule):

    term:string, block_id:int32, df:int64, n:int32,
    doc_id_min:uint64, doc_id_max:uint64,
    doc_ids:binary (delta+varbyte), tfs:binary (varbyte),
    dls:binary (varbyte, per-doc analyzed lengths for BM25),
    block_max_tf:int32, block_max_w:float64 (exact BM25 tf/dl partial
    upper bound for block-max WAND),
    positions:binary|null (per-doc delta chains, concatenated;
    boundaries recoverable from tfs).
"""

from __future__ import annotations

import zlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("block_id", pa.int32()),
        ("df", pa.int64()),
        ("n", pa.int32()),
        ("doc_id_min", pa.uint64()),
        ("doc_id_max", pa.uint64()),
        ("doc_ids", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
        ("block_max_tf", pa.int32()),
        ("block_max_w", pa.float64()),
        ("positions", pa.binary()),
    ]
)


def term_shard(terms: np.ndarray, num_shards: int) -> np.ndarray:
    """Stable term → shard hash (crc32; independent of Python hash seed)."""
    return np.fromiter(
        (zlib.crc32(t.encode()) % num_shards for t in terms),
        dtype=np.int32,
        count=len(terms),
    )


def _salt_step(num_shards: int) -> int:
    """Golden-ratio stride coprime to ``num_shards`` — low-discrepancy
    spacing for ANY prefix of the subset sequence."""
    import math

    step = max(1, round(num_shards * 0.6180339887))
    while math.gcd(step, num_shards) != 1:
        step += 1
    return step


def salt_shard(term: str, salt: int, num_shards: int) -> int:
    """Shard of a salted head-term subset (subset s = docs with
    ``doc_id % n_salts == s``).

    Subsets step from a per-term hashed base by a fixed golden-ratio
    stride: one term's first ``num_shards`` subsets never collide on a
    shard (independent per-subset hashing Poisson-clumped up to 8
    subsets onto one reducer at 64 shards, recreating the straggler
    salting exists to remove). The placement of subset ``s`` must NOT
    depend on the term's total ``n_salts``: increment merges take the
    max of per-generation salt counts (``build/merge.py``), and probing
    the first ``max(n)`` subsets has to cover every generation's
    layout."""
    return (zlib.crc32(f"{term}#".encode()) + salt * _salt_step(num_shards)) % num_shards


def explode_batch(batch: pa.Table, num_shards: int, positional: bool) -> pa.Table:
    """Per-doc term vectors → posting rows (shard, term, doc_id, tf, dl
    [, positions])."""
    terms_col = batch["terms"].combine_chunks()
    runs_per_doc = terms_col.value_lengths().to_numpy(zero_copy_only=False)
    terms_flat = terms_col.flatten()
    tfs_flat = batch["tfs"].combine_chunks().flatten()
    doc_rep = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), runs_per_doc)
    dl_rep = np.repeat(batch["dl"].to_numpy(zero_copy_only=False), runs_per_doc)

    # shard per unique term only (vocab << postings)
    import pandas as pd

    tcodes, tuniq = pd.factorize(terms_flat.to_numpy(zero_copy_only=False))
    shard_uniq = term_shard(np.asarray(tuniq, dtype=object), num_shards)
    shards = shard_uniq[tcodes] if len(tcodes) else np.empty(0, np.int32)

    cols = {
        "shard": pa.array(shards, pa.int32()),
        "term": terms_flat,
        "doc_id": pa.array(doc_rep, pa.uint64()),
        "tf": tfs_flat,
        "dl": pa.array(dl_rep, pa.int32()),
    }
    if positional and "positions" in batch.column_names:
        cols["positions"] = batch["positions"].combine_chunks().flatten()
    return pa.table(cols)


def explode_partials(
    batch: pa.Table,
    num_shards: int,
    positional: bool,
    salted: dict[str, int] | None = None,
    encode: bool = False,
) -> pa.Table:
    """Per-doc term vectors → per-(shard, term) PARTIAL posting rows.

    The combiner pattern (ray_guide "Aggregation at scale"): instead of
    shuffling one row per posting, each analyze batch pre-groups its
    postings by term, so the shuffle moves one list-valued row per
    (term, batch) — ~2 orders of magnitude fewer rows through the sort at
    equal payload bytes. Doc ids within a partial are ascending (batch
    order); the shard reducer merge-sorts partials.

    ``salted``: head-term skew handling (SURVEY.md §4) — terms in the map
    have their postings split into ``n_salts`` deterministic doc-id
    subsets (``doc_id % n_salts``), each routed to its own reducer shard
    (``salt_shard``), so one giant posting list encodes in parallel. The
    query engine k-way merges the subsets at load (``manifest.salted_terms``).

    Schema (``encode=False``): ``shard:int32, term:string,
    doc_ids:list<uint64>, tfs:list<int32>, dls:list<int32>
    [, positions:list<list<int32>>]``.

    ``encode=True`` (the build shuffle path): map-side combiner
    COMPRESSION — each partial's streams are delta+varbyte encoded
    before the exchange, so the all-to-all shuffle moves ~1 byte/value
    instead of 4-8 (at cluster scale the shuffle is network-bound; this
    is a direct ~4x cut of exchange bytes). Schema: ``shard:int32,
    term:string, n:int32, doc_ids:binary (delta+varbyte, fresh chain
    per partial), tfs:binary (varbyte), dls:binary (varbyte)
    [, positions:binary (per-doc delta chains; counts = decoded tfs)]``.
    The reducer decodes column-wise in one vectorized pass
    (``_arrays_from_partials``).
    """
    exploded = explode_batch(batch, num_shards, positional)
    if salted:
        exploded = _resalt_exploded(exploded, num_shards, salted)
    n = exploded.num_rows
    import pandas as pd

    tcodes, tuniq = pd.factorize(exploded["term"].to_numpy(zero_copy_only=False))
    shards_arr = exploded["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
    # group by (term, shard) — salted terms span several shards per batch
    key = tcodes.astype(np.int64) * num_shards + shards_arr
    # sort by (group, doc_id): a Ray block can span input-file fragments,
    # so batch order is NOT globally doc-ascending — the encoded wire
    # format (delta chains per partial) requires ascending doc ids
    doc_np = exploded["doc_id"].to_numpy(zero_copy_only=False) if n else np.empty(0, np.uint64)
    order = np.lexsort((doc_np, key)) if n else np.empty(0, np.int64)
    t_s = tcodes[order]
    k_s = key[order]
    if n:
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = k_s[1:] != k_s[:-1]
        run_starts = np.flatnonzero(new_run)
        run_lens = np.diff(np.append(run_starts, n))
    else:
        run_starts = np.empty(0, np.int64)
        run_lens = np.empty(0, np.int64)
    offsets = pa.array(np.concatenate(([0], np.cumsum(run_lens))).astype(np.int32))
    order_idx = pa.array(order)
    run_terms = np.asarray(tuniq, dtype=object)[t_s[run_starts]] if n else np.empty(0, object)
    shard_col = (
        exploded["shard"].take(pa.array(order[run_starts])) if n else pa.array([], pa.int32())
    )

    if encode:
        return _encode_partials(
            exploded, order, run_starts, run_lens, run_terms, shard_col, positional
        )

    def list_of(col_name):
        vals = exploded[col_name].take(order_idx)
        return pa.ListArray.from_arrays(offsets, vals.combine_chunks())

    cols = {
        "shard": shard_col,
        "term": pa.array(run_terms, pa.string()),
        "doc_ids": list_of("doc_id"),
        "tfs": list_of("tf"),
        "dls": list_of("dl"),
    }
    if positional and "positions" in exploded.column_names:
        cols["positions"] = list_of("positions")
    return pa.table(cols)


def _bin_streams(stream: bytes, widths: np.ndarray, value_bounds: np.ndarray) -> pa.Array:
    """Zero-copy binary column over an encoded stream: per-row slices at
    ``value_bounds`` (value indices), converted to byte offsets via the
    per-value widths."""
    byte_ends = np.concatenate(([0], np.cumsum(widths, dtype=np.int64)))
    if byte_ends[-1] >= 1 << 31:
        # pa.binary() offsets are int32 — a >2 GiB encoded stream in one
        # map task would wrap silently and ship corrupt wire partials
        raise ValueError(
            f"encoded posting stream is {byte_ends[-1]} bytes (>= 2 GiB) in one "
            "map task; lower the analyze batch size / block size so per-task "
            "partials stay under the int32 binary-offset limit"
        )
    offs = byte_ends[value_bounds].astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        len(value_bounds) - 1,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(stream)],
    )


def _encode_partials(
    exploded: pa.Table,
    order: np.ndarray,
    run_starts: np.ndarray,
    run_lens: np.ndarray,
    run_terms: np.ndarray,
    shard_col,
    positional: bool,
) -> pa.Table:
    """Map-side combiner compression: encode each partial's streams with
    the wire codec before the shuffle (see ``explode_partials``)."""
    from ..codec.varbyte import varbyte_encode_with_widths

    n = len(order)
    value_bounds = np.concatenate((run_starts, [n])).astype(np.int64)

    doc_s = exploded["doc_id"].to_numpy(zero_copy_only=False)[order].view(np.int64)
    d = doc_s.copy()
    if n:
        d[1:] -= doc_s[:-1]
        d[run_starts] = doc_s[run_starts]  # fresh delta chain per partial
    cols = {
        "shard": shard_col,
        "term": pa.array(run_terms, pa.string()),
        "n": pa.array(run_lens.astype(np.int32), pa.int32()),
        "doc_ids": _bin_streams(*varbyte_encode_with_widths(d), value_bounds),
        "tfs": _bin_streams(
            *varbyte_encode_with_widths(
                exploded["tf"].to_numpy(zero_copy_only=False)[order]
            ),
            value_bounds,
        ),
        "dls": _bin_streams(
            *varbyte_encode_with_widths(
                exploded["dl"].to_numpy(zero_copy_only=False)[order]
            ),
            value_bounds,
        ),
    }
    if positional and "positions" in exploded.column_names:
        pos_col = exploded["positions"].combine_chunks()
        pcnt_all = pos_col.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        pos_all = pos_col.flatten().to_numpy(zero_copy_only=False)
        pos_off_all = np.cumsum(pcnt_all) - pcnt_all
        pcnt_s = pcnt_all[order]
        idx = _gather_ranges(pos_off_all[order], pcnt_s)
        pv = pos_all[idx].astype(np.int64, copy=False)
        row_ends = np.cumsum(pcnt_s)
        dpos = pv.copy()
        if len(dpos):
            dpos[1:] -= pv[:-1]
            row_firsts = (row_ends - pcnt_s)[pcnt_s > 0]
            dpos[row_firsts] = pv[row_firsts]  # fresh chain per (doc, term)
        pos_value_bounds = np.concatenate(([0], row_ends))[value_bounds]
        cols["positions"] = _bin_streams(
            *varbyte_encode_with_widths(dpos), pos_value_bounds
        )
    return pa.table(cols)


def _bin_col_stream(col) -> np.ndarray:
    """Contiguous concatenated byte stream of a binary column (values are
    stored back-to-back in offset order — one slice, no per-row copies)."""
    arr = col.combine_chunks()
    off = np.frombuffer(arr.buffers()[1], np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    return data[off[0] : off[-1]]


def _resalt_exploded(
    exploded: pa.Table, num_shards: int, salted: dict[str, int]
) -> pa.Table:
    """Reassign shard for salted head terms: subset ``doc_id % n_salts``
    → ``salt_shard(term, salt)``."""
    import pandas as pd

    tcodes, tuniq = pd.factorize(exploded["term"].to_numpy(zero_copy_only=False))
    n_salts_uniq = np.asarray([salted.get(t, 0) for t in tuniq], dtype=np.int64)
    if not (n_salts_uniq > 0).any():
        return exploded
    # one vectorized pass over all salted rows (a per-hot-term mask loop
    # is O(hot_terms x rows) — 67 head terms made it a real map-side cost)
    flat_lut = np.asarray(
        [
            salt_shard(tuniq[u], s, num_shards)
            for u in np.flatnonzero(n_salts_uniq > 0)
            for s in range(int(n_salts_uniq[u]))
        ],
        dtype=np.int32,
    )
    # flat_lut is dense over salted terms only — map via compacted offsets
    dense_off = np.full(len(tuniq), -1, dtype=np.int64)
    pos = 0
    for u in np.flatnonzero(n_salts_uniq > 0):
        dense_off[u] = pos
        pos += int(n_salts_uniq[u])
    ns_row = n_salts_uniq[tcodes]
    sel = np.flatnonzero(ns_row > 0)
    if not len(sel):
        return exploded
    shards = exploded["shard"].to_numpy(zero_copy_only=False).astype(np.int32).copy()
    docs = exploded["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    subset = docs[sel] % ns_row[sel]
    shards[sel] = flat_lut[dense_off[tcodes[sel]] + subset]
    idx = exploded.column_names.index("shard")
    return exploded.set_column(idx, "shard", pa.array(shards, pa.int32()))


def _arrays_from_partials(group: pa.Table, positional: bool):
    """Flatten partial rows back to exploded arrays, sorted by
    (term-alphabetical, doc_id)."""
    import pandas as pd

    tcodes, tuniq = pd.factorize(group["term"].to_numpy(zero_copy_only=False))
    encoded = pa.types.is_binary(group.schema.field("doc_ids").type)
    if encoded:
        # wire-codec partials (explode_partials(encode=True)): decode each
        # column in ONE vectorized pass over the concatenated streams;
        # per-partial delta chains restart via dec_grouped(counts)
        from ..codec.posting import DeltaVarbytePostingCodec as _WIRE
        from ..codec.varbyte import varbyte_decode

        counts = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_flat = _WIRE.dec_grouped(_bin_col_stream(group["doc_ids"]), counts)
        tf_flat = varbyte_decode(_bin_col_stream(group["tfs"])).astype(np.int32)
        dl_flat = varbyte_decode(_bin_col_stream(group["dls"])).astype(np.int32)
    else:
        ids_col = group["doc_ids"].combine_chunks()
        # native dtypes throughout (uint64 ids, int32 tf/dl/positions): the
        # encode path is memory-bandwidth bound, widening copies dominate
        counts = ids_col.value_lengths().to_numpy(zero_copy_only=False)
        doc_flat = ids_col.flatten().to_numpy(zero_copy_only=False)
        tf_flat = group["tfs"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        dl_flat = group["dls"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    tcode_flat = np.repeat(tcodes, counts)

    # alphabetical term rank for deterministic output order
    order_alpha = np.argsort(np.asarray(tuniq, dtype=object), kind="stable")
    rank = np.empty(len(order_alpha), dtype=np.int64)
    rank[order_alpha] = np.arange(len(order_alpha))
    tuniq_sorted = np.asarray(tuniq, dtype=object)[order_alpha]

    order = np.lexsort((doc_flat, rank[tcode_flat])) if len(doc_flat) else np.empty(0, np.int64)
    doc_s = doc_flat[order]
    tf_s = tf_flat[order]
    dl_s = dl_flat[order]
    trank_s = rank[tcode_flat][order]

    if positional and "positions" in group.column_names:
        if encoded:
            # per-(doc,term) position counts ARE the term freqs — no
            # stored list offsets needed on the wire
            pos_counts_all = tf_flat.astype(np.int64)
            pos_values_all = _WIRE.dec_grouped(
                _bin_col_stream(group["positions"]), pos_counts_all
            ).astype(np.int32)
        else:
            pos_outer = group["positions"].combine_chunks().flatten()  # list<int32> per (doc,term)
            pos_counts_all = pos_outer.value_lengths().to_numpy(zero_copy_only=False)
            pos_values_all = pos_outer.flatten().to_numpy(zero_copy_only=False)
        pos_offsets_all = np.cumsum(pos_counts_all) - pos_counts_all
        idx = _gather_ranges(pos_offsets_all[order], pos_counts_all[order])
        pos_values = pos_values_all[idx]
        pos_counts = pos_counts_all[order]
    else:
        pos_values = pos_counts = None
    return trank_s, tuniq_sorted, doc_s, tf_s, dl_s, pos_values, pos_counts


def build_shard_blocks(
    group: pa.Table,
    *,
    block_size: int,
    avgdl: float,
    k1: float,
    b: float,
    positional: bool,
    codec: str = "delta_varbyte",
) -> pa.Table:
    """Reduce one shard's posting rows (exploded or partial schema) into
    encoded posting-block rows."""
    from ..codec.posting import get_posting_codec

    cod = get_posting_codec(codec)
    if "doc_ids" in group.column_names:
        # partial (combiner) schema from explode_partials
        trank, tuniq_sorted, doc_ids, tfs, dls, pos_values, pos_counts = (
            _arrays_from_partials(group, positional)
        )
    else:
        order_tbl = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        import pandas as pd

        tcodes, tuniq = pd.factorize(order_tbl["term"].to_numpy(zero_copy_only=False))
        trank = tcodes  # already in sorted-term order
        tuniq_sorted = np.asarray(tuniq, dtype=object)
        doc_ids = order_tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tfs = order_tbl["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dls = order_tbl["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        if positional:
            pos_col = order_tbl["positions"].combine_chunks()
            pos_values = pos_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            pos_counts = pos_col.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            pos_values = pos_counts = None
    n_rows = len(doc_ids)
    if pos_counts is not None:
        pos_offsets = np.cumsum(pos_counts) - pos_counts

    if n_rows:
        new_term = np.empty(n_rows, dtype=bool)
        new_term[0] = True
        new_term[1:] = trank[1:] != trank[:-1]
        term_starts = np.flatnonzero(new_term)
        term_lens = np.diff(np.append(term_starts, n_rows))
    else:
        term_starts = np.empty(0, np.int64)
        term_lens = np.empty(0, np.int64)

    # BM25 partial weight per posting (exact; idf applied at query time)
    w = tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))

    out = {name: [] for name in POSTINGS_SCHEMA.names}
    for t0, tl in zip(term_starts, term_lens):
        term_str = tuniq_sorted[trank[t0]]
        df = int(tl)
        n_blocks = (df + block_size - 1) // block_size
        # one encode pass per TERM, sliced at block boundaries — head
        # terms (many blocks) pay O(df) instead of O(blocks) numpy calls
        bounds = np.minimum(np.arange(n_blocks + 1) * block_size, tl)
        ids_t = doc_ids[t0 : t0 + tl]
        tfs_t = tfs[t0 : t0 + tl]
        dls_t = dls[t0 : t0 + tl]
        id_blocks = cod.enc_sorted_blocks(ids_t, bounds)
        tf_blocks = cod.enc_plain_blocks(tfs_t, bounds)
        dl_blocks = cod.enc_plain_blocks(dls_t, bounds)
        max_tf = np.maximum.reduceat(tfs_t, bounds[:-1])
        max_w = np.maximum.reduceat(w[t0 : t0 + tl], bounds[:-1])
        if positional:
            sel_counts = pos_counts[t0 : t0 + tl]
            # rows are contiguous in sorted order, so the term's position
            # values are one contiguous range — zero-copy slice, no gather
            p_lo = int(pos_offsets[t0])
            pvals = pos_values[p_lo : p_lo + int(sel_counts.sum())]
            starts_mask = np.zeros(len(pvals), dtype=bool)
            val_ends = np.cumsum(sel_counts)
            starts_mask[val_ends - sel_counts] = True
            # block boundaries in position-value space (block edge = doc edge)
            pos_bounds = np.concatenate(([0], val_ends))[bounds]
            pos_blocks = cod.enc_grouped_blocks(pvals, starts_mask, pos_bounds)
        else:
            pos_blocks = [None] * n_blocks
        for blk in range(n_blocks):
            lo, hi = int(bounds[blk]), int(bounds[blk + 1])
            out["term"].append(term_str)
            out["block_id"].append(blk)
            out["df"].append(df)
            out["n"].append(hi - lo)
            out["doc_id_min"].append(int(ids_t[lo]))
            out["doc_id_max"].append(int(ids_t[hi - 1]))
            out["doc_ids"].append(id_blocks[blk])
            out["tfs"].append(tf_blocks[blk])
            out["dls"].append(dl_blocks[blk])
            out["block_max_tf"].append(int(max_tf[blk]))
            out["block_max_w"].append(float(max_w[blk]))
            out["positions"].append(pos_blocks[blk])
    return pa.table(
        {name: pa.array(out[name], POSTINGS_SCHEMA.field(name).type) for name in POSTINGS_SCHEMA.names}
    )


def _gather_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Indices covering [starts[i], starts[i]+counts[i]) concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    rep_starts = np.repeat(starts, counts)
    ends = np.cumsum(counts)
    within = np.arange(total) - np.repeat(ends - counts, counts)
    return rep_starts + within


class PostingShardWriter:
    """``groupby("shard").map_groups`` reducer: writes one shard file
    atomically and returns a lineage row (per-partition checkpoint unit —
    a rerun skips shards whose file already exists)."""

    def __init__(
        self,
        out_dir: str,
        *,
        block_size: int,
        avgdl: float,
        k1: float,
        b: float,
        positional: bool,
        resume: bool = True,
        codec: str = "delta_varbyte",
    ):
        self.out_dir = Path(out_dir)
        self.block_size = block_size
        self.avgdl = avgdl
        self.k1 = k1
        self.b = b
        self.positional = positional
        self.resume = resume
        self.codec = codec

    def __call__(self, group: pa.Table) -> pa.Table:
        import time

        t0 = time.perf_counter()
        shard = int(group["shard"][0].as_py())
        path = self.out_dir / f"shard={shard:05d}.parquet"
        if self.resume and path.exists():
            meta = pq.read_metadata(path)
            return _lineage_row(shard, meta.num_rows, 0, path.stat().st_size, 0.0, True)
        n_chunks = group["term"].num_chunks if hasattr(group["term"], "num_chunks") else 1
        group = group.combine_chunks()
        t_comb = time.perf_counter()
        blocks = build_shard_blocks(
            group,
            block_size=self.block_size,
            avgdl=self.avgdl,
            k1=self.k1,
            b=self.b,
            positional=self.positional,
            codec=self.codec,
        )
        t_enc = time.perf_counter()
        tmp = path.with_suffix(".tmp")
        # small row groups: term-sorted blocks + min/max stats → query-side
        # `term isin` reads skip row groups instead of the whole shard
        pq.write_table(blocks, tmp, row_group_size=1024)
        tmp.rename(path)
        return _lineage_row(
            shard, blocks.num_rows, group.num_rows, path.stat().st_size,
            time.perf_counter() - t0, False,
            detail=(
                f"chunks={n_chunks} comb={t_comb - t0:.2f} "
                f"enc={t_enc - t_comb:.2f} write={time.perf_counter() - t_enc:.2f}"
            ),
        )


def _lineage_row(shard, n_blocks, n_postings, nbytes, secs, skipped, detail="") -> pa.Table:
    # one fixed schema for fresh AND resume-skipped shards — a map_groups
    # operator must not emit mixed schemas
    return pa.table(
        {
            "shard": pa.array([shard], pa.int32()),
            "n_blocks": pa.array([n_blocks], pa.int64()),
            "n_postings": pa.array([n_postings], pa.int64()),
            "bytes": pa.array([nbytes], pa.int64()),
            "seconds": pa.array([secs], pa.float64()),
            "skipped": pa.array([skipped], pa.bool_()),
            "detail": pa.array([detail], pa.string()),
        }
    )
