"""Incremental generations + compaction — the Ray-native replacement for
the reference's LSM segment merge (``InvertedIndex.merge``,
``InvertedIndex.java:567-697``; pairwise cascade
``InvertedIndexManager.java:384-452``).

Model: an index holds one or more immutable posting *generations*
(``manifest.generations``). New documents are indexed as a delta index
(same build pipeline) and attached as a new generation — doc ids must be
disjoint (they derive from data: url hash / explicit column — never
renumbered, unlike the reference's id-compaction on merge,
``InvertedIndex.java:678``). The query engine k-way merges generations at
term-load time; :func:`compact` physically merges all generations into
one (a Ray ``map`` over shard ids — deterministic partitioned reduce,
not a pairwise cascade) and drops tombstoned docs (reference merge
filters deleted docs, ``InvertedIndex.java:640-697``)."""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codec.posting import get_posting_codec
from ..stages.postings import build_shard_blocks
from .manifest import IndexManifest


def _check_disjoint_doc_ids(main_analyzed: Path, delta_analyzed: Path) -> None:
    """Doc ids across generations MUST be disjoint (they derive from data,
    never renumbered); a re-indexed id would double-count n_docs/df and
    break the engine's ``assume_unique`` intersections. Vectorized scan:
    the delta id set (small side) held in memory, main side streamed one
    column per file."""
    if not (main_analyzed.exists() and delta_analyzed.exists()):
        return
    delta_ids = np.concatenate([
        pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy(zero_copy_only=False)
        for f in sorted(delta_analyzed.glob("*.parquet"))
    ] or [np.empty(0, np.uint64)])
    if not len(delta_ids):
        return
    delta_ids = np.unique(delta_ids)
    for f in sorted(main_analyzed.glob("*.parquet")):
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy(zero_copy_only=False)
        hit = ids[np.isin(ids, delta_ids)]
        if len(hit):
            raise ValueError(
                f"delta re-indexes {len(hit)} doc id(s) already present in the "
                f"main index (e.g. {int(hit[0])}); generations must hold "
                "disjoint doc ids — compact + rebuild, or drop the dupes"
            )


def attach_generation(
    index_dir: str | Path, delta_dir: str | Path, validate_disjoint: bool = True
) -> IndexManifest:
    """Attach a separately built delta index as a new generation.

    Copies the delta's posting shards in as ``gen-<k>`` and appends its
    docstats/docs files; updates global stats (n_docs, avgdl) in the
    manifest. BM25 scores then reflect the merged corpus exactly as a
    full rebuild would (verified in tests). ``validate_disjoint`` scans
    the main docstats id column once — disable for huge indexes where
    the caller guarantees disjointness."""
    index_dir, delta_dir = Path(index_dir), Path(delta_dir)
    main = IndexManifest.load(index_dir)
    delta = IndexManifest.load(delta_dir)
    if (
        main.analyzer_mode, main.positional, main.num_shards, main.block_size,
        main.codec, main.bm25_k1, main.bm25_b,
    ) != (
        delta.analyzer_mode, delta.positional, delta.num_shards, delta.block_size,
        delta.codec, delta.bm25_k1, delta.bm25_b,
    ):
        raise ValueError("delta index build parameters do not match the main index")

    if validate_disjoint:
        _check_disjoint_doc_ids(index_dir / "analyzed", delta_dir / "analyzed")

    gen_name = f"gen-{len(main.generations)}"
    gen_dir = index_dir / gen_name
    if gen_dir.exists():
        shutil.rmtree(gen_dir)
    shutil.copytree(delta_dir / "postings", gen_dir)

    for sub in ("analyzed", "docs"):
        src = delta_dir / sub
        dst = index_dir / sub
        if src.exists() and dst.exists():
            for i, f in enumerate(sorted(src.glob("*.parquet"))):
                shutil.copy(f, dst / f"{gen_name}-{i:05d}.parquet")

    # stored block_max_w in each generation's shards was encoded against
    # that generation's build-time avgdl; the engine rescales bounds when
    # the manifest avgdl has drifted since (WAND soundness) — record the
    # base generations' build avgdl before it moves
    for g in main.generations:
        ph = main.phases.setdefault(g, {"completed": True})
        ph.setdefault("built_avgdl", main.avgdl)

    main.generations = list(main.generations) + [gen_name]
    for t, n in delta.salted_terms.items():
        main.salted_terms[t] = max(main.salted_terms.get(t, 0), n)
    main.n_docs += delta.n_docs
    main.total_tokens += delta.total_tokens
    main.avgdl = main.total_tokens / main.n_docs if main.n_docs else 0.0
    main.phases[gen_name] = {
        "completed": True,
        "n_docs": delta.n_docs,
        "built_avgdl": delta.avgdl,
    }
    main.save(index_dir)
    return main


def build_increment(
    corpus_path: str | list[str], index_dir: str | Path, scratch_dir: str | Path, **build_kwargs
) -> IndexManifest:
    """Index new documents (delta build into ``scratch_dir``) and attach
    them to ``index_dir`` as a new generation."""
    from .indexer import build_index

    main = IndexManifest.load(index_dir)
    build_kwargs.setdefault("analyzer_mode", main.analyzer_mode)
    build_kwargs.setdefault("positional", main.positional)
    build_kwargs.setdefault("num_shards", main.num_shards)
    build_kwargs.setdefault("block_size", main.block_size)
    build_kwargs.setdefault("codec", main.codec)
    build_kwargs.setdefault("bm25_k1", main.bm25_k1)
    build_kwargs.setdefault("bm25_b", main.bm25_b)
    build_index(corpus_path, scratch_dir, resume=False, **build_kwargs)
    return attach_generation(index_dir, scratch_dir)


def _decode_shard_rows(path: Path, positional: bool, codec: str) -> pa.Table:
    """Shard file → posting-rows table (see :func:`_decode_block_rows`)."""
    return _decode_block_rows(pq.read_table(path), positional, codec)


def _decode_block_rows(tbl: pa.Table, positional: bool, codec: str) -> pa.Table:
    """Posting-block rows → posting-rows table (term, doc_id, tf, dl,
    positions).

    Column-wise iteration (one ``to_pylist`` per encoded column) rather
    than row dicts; positions become one flat values buffer + offsets, no
    per-posting Python lists."""
    cod = get_posting_codec(codec)
    terms_col = tbl["term"].to_pylist()
    ids_col = tbl["doc_ids"].to_pylist()
    tfs_col = tbl["tfs"].to_pylist()
    dls_col = tbl["dls"].to_pylist()
    pos_col = tbl["positions"].to_pylist() if positional and "positions" in tbl.column_names else None
    terms_out, ids_out, tfs_out, dls_out = [], [], [], []
    pos_flat, pos_counts, pos_valid = [], [], []
    for r in range(tbl.num_rows):
        ids = cod.dec_sorted(ids_col[r])
        tfs = cod.dec_plain(tfs_col[r])
        ids_out.append(ids)
        tfs_out.append(tfs)
        dls_out.append(cod.dec_plain(dls_col[r]))
        terms_out.extend([terms_col[r]] * len(ids))
        if pos_col is not None:
            enc = pos_col[r]
            if enc is not None:
                pos_flat.append(np.asarray(cod.dec_grouped(enc, tfs), np.int32))
                pos_counts.append(np.asarray(tfs, np.int64))
                pos_valid.append(np.ones(len(ids), bool))
            else:
                pos_counts.append(np.zeros(len(ids), np.int64))
                pos_valid.append(np.zeros(len(ids), bool))
    cols = {
        "term": pa.array(terms_out, pa.string()),
        "doc_id": pa.array(np.concatenate(ids_out) if ids_out else [], pa.uint64()),
        "tf": pa.array(np.concatenate(tfs_out) if tfs_out else [], pa.int32()),
        "dl": pa.array(np.concatenate(dls_out) if dls_out else [], pa.int32()),
    }
    if pos_col is not None:
        counts = np.concatenate(pos_counts) if pos_counts else np.empty(0, np.int64)
        valid = np.concatenate(pos_valid) if pos_valid else np.empty(0, bool)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        values = np.concatenate(pos_flat) if pos_flat else np.empty(0, np.int32)
        arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(values, pa.int32())
        )
        if not valid.all():
            # rows written without positions stay null, not empty
            arr = pa.Array.from_pandas(
                [v if ok else None for v, ok in zip(arr.to_pylist(), valid)],
                type=pa.list_(pa.int32()),
            )
        cols["positions"] = arr
    return pa.table(cols)


_SMALL_STATS_BYTES = 256 << 20


def _live_docstats(stats_dir: Path, tombs: np.ndarray, use_ray: bool) -> tuple[int, int]:
    """(n_docs, total_tokens) over non-tombstoned docs. Column-pruned to
    (doc_id, dl); distributed aggregate above the small-input gate."""
    import pyarrow.compute as pc

    total_bytes = sum(f.stat().st_size for f in stats_dir.glob("*.parquet"))
    if not use_ray or total_bytes <= _SMALL_STATS_BYTES:
        t = pq.read_table(str(stats_dir), columns=["doc_id", "dl"])
        if len(tombs):
            t = t.filter(
                pc.invert(pc.is_in(t["doc_id"].cast(pa.uint64()), pa.array(tombs, pa.uint64())))
            )
        return t.num_rows, int(pc.sum(t["dl"]).as_py() or 0)

    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    tombs_ref = ray.put(tombs)

    def drop_tombs(batch: pa.Table) -> pa.Table:
        tb = ray.get(tombs_ref)
        if not len(tb):
            return batch
        ids = batch["doc_id"].cast(pa.uint64()).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(ids, tb)))

    row = (
        rd.read_parquet(str(stats_dir), columns=["doc_id", "dl"])
        .map_batches(drop_tombs, batch_format="pyarrow")
        .aggregate(Count(alias_name="n"), Sum("dl", alias_name="total"))
    )
    return int(row["n"] or 0), int(row["total"] or 0)


def _rewrite_analyzed(stats_dir: Path, tombs: np.ndarray, use_ray: bool) -> None:
    """Drop tombstoned docs from every analyzed file, one task per file —
    the multi-file layout (and with it resumable parallel reads) is
    preserved; list columns never pass through the driver."""
    import pyarrow.compute as pc

    files = sorted(stats_dir.glob("*.parquet"))

    def rewrite_one(path: Path, tb: np.ndarray) -> None:
        t = pq.read_table(path)
        t = t.filter(
            pc.invert(pc.is_in(t["doc_id"].cast(pa.uint64()), pa.array(tb, pa.uint64())))
        )
        tmp = path.with_suffix(".tmp")
        pq.write_table(t, tmp)
        tmp.rename(path)

    if use_ray and len(files) > 1:
        import ray

        tombs_ref = ray.put(tombs)

        @ray.remote
        def _do(path: str) -> None:
            rewrite_one(Path(path), ray.get(tombs_ref))

        ray.get([_do.remote(str(f)) for f in files])
    else:
        for f in files:
            rewrite_one(f, tombs)


def compact(index_dir: str | Path, use_ray: bool = True) -> IndexManifest:
    """Physically merge all generations into a single ``postings``
    generation, dropping tombstoned documents, and rewrite docstats.
    One task per shard (``ray.remote`` fan-out over the fixed shard grid
    — a deterministic reduce, no pairwise merge cascade)."""
    index_dir = Path(index_dir)
    m = IndexManifest.load(index_dir)
    tombs = np.array(sorted(m.tombstones), dtype=np.uint64)
    out_dir = index_dir / "postings.compact"
    if out_dir.exists():
        shutil.rmtree(out_dir)
    out_dir.mkdir(parents=True)

    # post-compaction global stats FIRST, so block-max metadata is encoded
    # against the avgdl queries will actually use (WAND soundness).
    # Column-pruned (doc_id, dl) scan — NEVER the terms/positions list
    # columns — and distributed above the small-input gate; the full
    # analyzed rewrite happens after the shard merge, also distributed.
    stats_dir = index_dir / "analyzed"
    have_stats = stats_dir.exists()
    old_avgdl = m.avgdl or 1.0
    if have_stats:
        n_docs, total_tokens = _live_docstats(stats_dir, tombs, use_ray)
        m.n_docs = n_docs
        m.total_tokens = total_tokens
        m.avgdl = m.total_tokens / m.n_docs if m.n_docs else 0.0

    # per-generation upper-bound rescale for CARRIED (not re-encoded)
    # block maxima: stored block_max_w was computed at the generation's
    # build-time avgdl; the compacted generation declares the fresh
    # avgdl, so carried maxima are multiplied by the same sound factor
    # the engine would have applied at read time (max(1, new/built))
    new_avgdl = m.avgdl or 1.0
    gen_scale = {}
    for g in m.generations:
        built = m.phases.get(g, {}).get("built_avgdl") or old_avgdl
        gen_scale[g] = max(1.0, new_avgdl / float(built))

    args = [
        (
            shard,
            [(g, index_dir / g / f"shard={shard:05d}.parquet") for g in m.generations],
        )
        for shard in range(m.num_shards)
    ]

    if use_ray:
        import ray

        @ray.remote
        def _do(shard: int, paths) -> int:
            return _compact_shard(shard, paths, out_dir, m, tombs, gen_scale)

        ray.get([_do.remote(s, p) for s, p in args])
    else:
        for s, p in args:
            _compact_shard(s, p, out_dir, m, tombs, gen_scale)

    for g in m.generations:
        shutil.rmtree(index_dir / g, ignore_errors=True)
    out_dir.rename(index_dir / "postings")

    # rewrite analyzed/ minus tombstones (it is the per-doc-length source):
    # per-file parallel rewrite preserving the multi-file layout — no
    # driver-side materialization of the list columns
    if have_stats and len(tombs):
        _rewrite_analyzed(stats_dir, tombs, use_ray)

    for g in m.generations:
        m.phases.pop(g, None)
    m.generations = ["postings"]
    m.tombstones = []
    # compacted shards were encoded against the fresh post-compaction avgdl
    m.phases["postings"] = {"completed": True, "built_avgdl": m.avgdl}
    m.phases["compaction"] = {"completed": True}
    m.save(index_dir)
    return m


def _compact_shard(
    shard: int,
    paths: list[tuple[str, Path]],
    out_dir: Path,
    m: IndexManifest,
    tombs: np.ndarray,
    gen_scale: dict[str, float] | None = None,
) -> int:
    """Merge one shard's generations into one file — WITHOUT decoding
    clean blocks. Encoded posting blocks are self-contained (per-block
    delta bases), so a term whose per-generation doc-id ranges are
    disjoint and tombstone-free is carried verbatim: sort its block
    rows by ``doc_id_min``, renumber ``block_id``, sum ``df`` across
    generations, rescale ``block_max_w`` by the generation's avgdl
    factor. Only tombstone-hit or range-interleaved terms pay the
    decode→filter→re-encode path. This is what makes compaction cheaper
    than a scratch rebuild (round-3 verdict task 7)."""
    import pyarrow.compute as pc

    gen_scale = gen_scale or {}
    tabs: list[tuple[str, pa.Table]] = []
    for gen, p in paths:
        if p.exists():
            t = pq.read_table(p)
            if t.num_rows:
                tabs.append((gen, t))
    if not tabs:
        return 0

    enc = pa.concat_tables([t for _, t in tabs])
    gen_of_row = np.repeat(
        np.arange(len(tabs), dtype=np.int64), [t.num_rows for _, t in tabs]
    )
    scale_of_gen = np.array(
        [gen_scale.get(gen, 1.0) for gen, _ in tabs], np.float64
    )

    import pandas as pd

    terms = enc["term"].to_numpy(zero_copy_only=False)
    tcodes, _ = pd.factorize(terms)
    dmin = enc["doc_id_min"].to_numpy(zero_copy_only=False).astype(np.uint64)
    dmax = enc["doc_id_max"].to_numpy(zero_copy_only=False).astype(np.uint64)

    # order block rows by (term, doc_id_min) — the carried layout
    order = np.lexsort((dmin, tcodes))
    tc_o, dmin_o, dmax_o = tcodes[order], dmin[order], dmax[order]

    # dirty if any tombstone falls inside a block's id range, or
    # consecutive blocks of one term overlap (interleaved generations)
    if len(tombs):
        lo = np.searchsorted(tombs, dmin_o, side="left")
        hi = np.searchsorted(tombs, dmax_o, side="right")
        tomb_hit = lo < hi
    else:
        tomb_hit = np.zeros(len(tc_o), bool)
    same_term = np.zeros(len(tc_o), bool)
    if len(tc_o) > 1:
        same_term[1:] = tc_o[1:] == tc_o[:-1]
    overlap = np.zeros(len(tc_o), bool)
    if len(tc_o) > 1:
        overlap[1:] = same_term[1:] & (dmin_o[1:] <= dmax_o[:-1])

    n_terms = int(tcodes.max()) + 1 if len(tcodes) else 0
    dirty_term = np.zeros(n_terms, bool)
    np.logical_or.at(dirty_term, tc_o, tomb_hit | overlap)

    out_parts: list[pa.Table] = []

    clean_idx = order[~dirty_term[tc_o]]
    if len(clean_idx):
        clean = enc.take(pa.array(clean_idx, pa.int64()))
        ctc = tcodes[clean_idx]
        # block_id: running count within term (rows already term-grouped
        # and doc_id_min-sorted by construction of `order`)
        starts = np.flatnonzero(
            np.concatenate(([True], ctc[1:] != ctc[:-1]))
        )
        pos_in_term = np.arange(len(ctc)) - np.repeat(
            starts, np.diff(np.append(starts, len(ctc)))
        )
        # df: per-term sum over generations of the per-generation df
        # (df is repeated on each block row of a (gen, term) group)
        cdf = clean["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        cgen = gen_of_row[clean_idx]
        meta = pd.DataFrame({"t": ctc, "g": cgen, "df": cdf})
        per_gen = meta.drop_duplicates(["t", "g"]).groupby("t")["df"].sum()
        new_df = per_gen.reindex(ctc).to_numpy()
        new_maxw = (
            clean["block_max_w"].to_numpy(zero_copy_only=False)
            * scale_of_gen[cgen]
        )
        clean = clean.set_column(
            clean.schema.get_field_index("block_id"),
            "block_id",
            pa.array(pos_in_term.astype(np.int64), clean.schema.field("block_id").type),
        )
        clean = clean.set_column(
            clean.schema.get_field_index("df"),
            "df",
            pa.array(new_df.astype(np.int64), clean.schema.field("df").type),
        )
        clean = clean.set_column(
            clean.schema.get_field_index("block_max_w"),
            "block_max_w",
            pa.array(new_maxw, clean.schema.field("block_max_w").type),
        )
        out_parts.append(clean)

    if dirty_term.any():
        dirty_idx = np.flatnonzero(dirty_term[tcodes])
        dirty_enc = enc.take(pa.array(dirty_idx, pa.int64()))
        rows = _decode_block_rows(dirty_enc, m.positional, m.codec)
        if len(tombs):
            rows = rows.filter(
                pc.invert(pc.is_in(rows["doc_id"], pa.array(tombs, pa.uint64())))
            )
        if rows.num_rows:
            rebuilt = build_shard_blocks(
                rows,
                block_size=m.block_size,
                avgdl=m.avgdl or 1.0,
                k1=m.bm25_k1,
                b=m.bm25_b,
                positional=m.positional,
                codec=m.codec,
            )
            out_parts.append(rebuilt)

    if not out_parts:
        return 0
    blocks = pa.concat_tables(out_parts, promote_options="default").sort_by(
        [("term", "ascending"), ("block_id", "ascending")]
    )
    pq.write_table(blocks, out_dir / f"shard={shard:05d}.parquet")
    return blocks.num_rows
