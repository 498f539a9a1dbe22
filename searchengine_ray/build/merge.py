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
    """Shard file → posting-rows table (term, doc_id, tf, dl, positions)."""
    cod = get_posting_codec(codec)
    tbl = pq.read_table(path)
    terms_out, ids_out, tfs_out, dls_out, pos_out = [], [], [], [], []
    for row in tbl.to_pylist():
        ids = cod.dec_sorted(row["doc_ids"])
        tfs = cod.dec_plain(row["tfs"])
        dls = cod.dec_plain(row["dls"])
        terms_out.extend([row["term"]] * len(ids))
        ids_out.append(ids)
        tfs_out.append(tfs)
        dls_out.append(dls)
        if positional and row["positions"] is not None:
            pos_all = cod.dec_grouped(row["positions"], tfs)
            ends = np.cumsum(tfs)
            pos_out.extend(pos_all[e - c : e].tolist() for e, c in zip(ends, tfs))
        elif positional:
            pos_out.extend([None] * len(ids))
    cols = {
        "term": pa.array(terms_out, pa.string()),
        "doc_id": pa.array(np.concatenate(ids_out) if ids_out else [], pa.uint64()),
        "tf": pa.array(np.concatenate(tfs_out) if tfs_out else [], pa.int32()),
        "dl": pa.array(np.concatenate(dls_out) if dls_out else [], pa.int32()),
    }
    if positional:
        cols["positions"] = pa.array(pos_out, pa.list_(pa.int32()))
    return pa.table(cols)


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
    # against the avgdl queries will actually use (WAND soundness)
    stats_dir = index_dir / "analyzed"
    stats_tbl = None
    if stats_dir.exists():
        stats_tbl = pq.read_table(str(stats_dir))
        if len(tombs):
            import pyarrow.compute as pc

            stats_tbl = stats_tbl.filter(
                pc.invert(
                    pc.is_in(stats_tbl["doc_id"].cast(pa.uint64()), pa.array(tombs, pa.uint64()))
                )
            )
        m.n_docs = stats_tbl.num_rows
        m.total_tokens = int(pa.compute.sum(stats_tbl["dl"]).as_py() or 0)
        m.avgdl = m.total_tokens / m.n_docs if m.n_docs else 0.0


    gen_dirs = [index_dir / g for g in m.generations]
    args = [
        (shard, [g / f"shard={shard:05d}.parquet" for g in gen_dirs])
        for shard in range(m.num_shards)
    ]

    if use_ray:
        import ray

        @ray.remote
        def _do(shard: int, paths: list[Path]) -> int:
            return _compact_shard(shard, paths, out_dir, m, tombs)

        ray.get([_do.remote(s, p) for s, p in args])
    else:
        for s, p in args:
            _compact_shard(s, p, out_dir, m, tombs)

    for g in m.generations:
        shutil.rmtree(index_dir / g, ignore_errors=True)
    out_dir.rename(index_dir / "postings")

    # rewrite analyzed/ minus tombstones (it is the per-doc-length source)
    if stats_tbl is not None:
        shutil.rmtree(stats_dir)
        stats_dir.mkdir()
        pq.write_table(stats_tbl, stats_dir / "analyzed-00000.parquet")

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
    shard: int, paths: list[Path], out_dir: Path, m: IndexManifest, tombs: np.ndarray
) -> int:
    tables = [
        _decode_shard_rows(p, m.positional, m.codec) for p in paths if p.exists()
    ]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return 0
    rows = pa.concat_tables(tables)
    if len(tombs):
        import pyarrow.compute as pc

        rows = rows.filter(
            pc.invert(pc.is_in(rows["doc_id"], pa.array(tombs, pa.uint64())))
        )
    # recompute avgdl-dependent block maxima against post-compaction stats:
    # approximate with current manifest avgdl (exact stats rewritten after)
    blocks = build_shard_blocks(
        rows,
        block_size=m.block_size,
        avgdl=m.avgdl or 1.0,
        k1=m.bm25_k1,
        b=m.bm25_b,
        positional=m.positional,
        codec=m.codec,
    )
    pq.write_table(blocks, out_dir / f"shard={shard:05d}.parquet")
    return blocks.num_rows
