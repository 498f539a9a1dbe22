"""The index build pipeline — Ray-Data-first.

Reference lifecycle being replaced (SURVEY.md §3.1): corpus walk →
``addDocument`` analyze/accumulate → flush every 1000 docs → pairwise
segment merges (``IcsSearchEngine.java:38-59``,
``InvertedIndexManager.java:321-452``). Here the LSM machinery disappears
into a two-phase streaming pipeline:

Phase "analyze" (stateless read + actor-pool map):
    ``read_parquet(corpus, columns=pruned)``
    → ``map_batches(AnalyzeStage, batch_format="pyarrow")``
    → ``analyzed/`` Parquet (doc_id, dl, terms, tfs, positions)
    [+ ``docs/`` doc store for fetch joins; per-doc lengths are columns
    of analyzed/]

Phase "postings" (the wide step):
    ``read_parquet(analyzed/)``
    → ``map_batches(explode → (shard, term, doc_id, tf, dl, positions))``
    → ``groupby("shard").map_groups(PostingShardWriter)``
    → ``postings/shard=NNNNN.parquet`` + lineage rows

Checkpoint/resume: each phase records completion in ``manifest.json``;
within the postings phase every shard file is written atomically and a
rerun skips shards that already exist. Global stats (N, avgdl) are
computed once at build and stored in the manifest, so ranked queries do
NOT need the reference's per-query pass-1 over all segments
(``InvertedIndexManager.java:587-598``).

Scale notes: the only all-to-all exchange is the ``groupby(shard)``; head
terms are split into fixed-size blocks inside the shard reducer (skew
handling); the analyze stage is an actor pool sized via ``concurrency``;
batch format is Arrow end-to-end.
"""

from __future__ import annotations

import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from ..analysis.batch import PUNCT_PORTER
from ..stages.postings import PostingShardWriter, explode_batch, explode_partials
from ..stages.tokenize import AnalyzeStage
from .manifest import IndexManifest


def build_index(
    corpus_path: str | list[str],
    index_dir: str | Path,
    *,
    analyzer_mode: str = PUNCT_PORTER,
    positional: bool = True,
    num_shards: int = 16,
    block_size: int = 128,
    text_column: str = "text",
    html_column: str | None = None,
    url_column: str = "url",
    doc_id_column: str | None = None,
    doc_id_mode: str = "hash",
    validate_extraction: bool = False,
    store_docs: bool = True,
    analyze_concurrency: int | None = None,
    analyze_batch_size: int = 4096,
    bm25_k1: float = 1.2,
    bm25_b: float = 0.75,
    resume: bool = True,
    generation: str = "postings",
    codec: str = "delta_varbyte",
    salt_target_postings: int = 1_000_000,
    salt_max: int = 16,
    reduce_num_cpus: int | None = None,
) -> IndexManifest:
    """Build (or resume building) an index at ``index_dir``.

    Returns the saved manifest. Ray must already be initialised by the
    caller (driver/bench/test fixture own the session).
    """
    import ray.data as rd

    from ..codec.posting import get_posting_codec

    get_posting_codec(codec)  # fail fast, before any phase runs
    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)

    if resume and IndexManifest.exists(index_dir):
        manifest = IndexManifest.load(index_dir)
    else:
        manifest = IndexManifest(
            analyzer_mode=analyzer_mode,
            positional=positional,
            block_size=block_size,
            num_shards=num_shards,
            doc_id_mode=doc_id_mode if doc_id_column is None else f"column:{doc_id_column}",
            bm25_k1=bm25_k1,
            bm25_b=bm25_b,
            codec=codec,
        )

    analyzed_dir = index_dir / "analyzed"
    docs_dir = index_dir / "docs"
    postings_dir = index_dir / generation

    if url_column:
        # tolerate url-less corpora: the url column is only REQUIRED
        # when doc ids derive from it (doc_id_column is None);
        # otherwise it just enriches the doc store when present.
        import pyarrow.dataset as pads

        first = corpus_path[0] if isinstance(corpus_path, list) else corpus_path
        if url_column not in pads.dataset(first).schema.names:
            if doc_id_column is None:
                raise ValueError(
                    f"corpus has no '{url_column}' column; pass "
                    "doc_id_column= or provide urls for doc-id hashing"
                )
            url_column = None

    # ---------- phase A: analyze ----------
    if not manifest.phase_complete("analyze"):
        t0 = time.perf_counter()
        ticks0 = _cpu_ticks()
        spill0 = _spill_counters()
        columns = [text_column] if text_column else []
        if html_column:
            columns.append(html_column)
        if doc_id_column:
            columns.append(doc_id_column)
        if url_column and (doc_id_column is None or store_docs):
            columns.append(url_column)
        columns = list(dict.fromkeys(columns))
        ds = rd.read_parquet(corpus_path, columns=columns)

        # Stateful analysis WITHOUT an actor pool: tasks + a per-worker
        # stage cache (stages.tokenize._WORKER_STAGES) give the same
        # state amortization (stemmer memo built once per worker process,
        # SURVEY.md §2.3 T1/T4) while avoiding both actor-pool failure
        # modes measured here: autoscaling pools upscale too slowly, and
        # fixed pools either starve the read/write operators (size=CPUs)
        # or pay multi-second spin-up per pipeline (30 actors ≈ 5-6 s).
        stage_kwargs = dict(
            mode=analyzer_mode,
            positional=positional,
            text_column=text_column,
            html_column=html_column,
            doc_id_column=doc_id_column,
            doc_id_mode=doc_id_mode,
            url_column=url_column,
            validate_extraction=validate_extraction,
        )
        from ..stages.tokenize import make_analyze_fn

        if analyze_concurrency is not None:
            # explicit actor pool (e.g. heavyweight word-break dictionaries)
            analyzed = ds.map_batches(
                AnalyzeStage,
                fn_constructor_kwargs=stage_kwargs,
                batch_format="pyarrow",
                batch_size=analyze_batch_size,
                concurrency=analyze_concurrency,
            )
        else:
            analyzed = ds.map_batches(
                make_analyze_fn(**stage_kwargs),
                batch_format="pyarrow",
                batch_size=analyze_batch_size,
            )
        _write_parquet_atomic(analyzed, analyzed_dir)
        t_map_done = time.perf_counter()

        # doc store (url/text for fetch joins) — separate pruned pass so the
        # analyzed table stays narrow
        if store_docs:
            doc_cols = [c for c in {url_column, text_column, doc_id_column} if c]

            def _with_ids(batch: pa.Table) -> pa.Table:
                if doc_id_column:
                    ids = batch[doc_id_column].cast(pa.uint64())
                    batch = batch.drop_columns([doc_id_column])
                else:
                    from ..stages.tokenize import doc_ids_from_urls

                    ids = pa.array(
                        doc_ids_from_urls(batch[url_column].to_pylist(), doc_id_mode),
                        pa.uint64(),
                    )
                return batch.append_column("doc_id", ids)

            # docs/ is doc_id-sorted (SURVEY §1.4): row-group min/max
            # statistics then turn fetch_docs point lookups into pruned
            # row-group reads instead of full scans
            if _total_bytes(corpus_path) <= _SMALL_INPUT_BYTES:
                # KB-scale input: a Ray pipeline costs seconds of fixed
                # overhead to move kilobytes — write directly

                tbl = pq.read_table(corpus_path, columns=list(doc_cols))
                _write_table_atomic(
                    _with_ids(tbl).sort_by("doc_id"), docs_dir, row_group_size=2048
                )
            else:
                docs_ds = rd.read_parquet(corpus_path, columns=list(doc_cols))
                _write_parquet_atomic(
                    docs_ds.map_batches(_with_ids, batch_format="pyarrow").sort("doc_id"),
                    docs_dir,
                    row_group_size=2048,
                )

        # global stats over the (narrow) analyzed output; per-doc lengths
        # live in analyzed/ (column-pruned reads), no separate docstats
        # copy. n_docs comes from the parquet footers (no data scan);
        # total_tokens from the dl column — a local single-column read
        # while the column is driver-sized (a distributed Count/Sum
        # aggregate here measured 10-20 s of fixed pipeline cost at 1M
        # docs for ~8 MB of data), a distributed Sum beyond the gate
        n_docs, dl_bytes = 0, 0
        files = sorted(Path(analyzed_dir).glob("*.parquet"))
        for f in files:
            md = pq.ParquetFile(f).metadata
            n_docs += md.num_rows
            dl_idx = _leaf_column_index(md, "dl")
            if dl_idx is not None:
                for rg in range(md.num_row_groups):
                    dl_bytes += md.row_group(rg).column(dl_idx).total_compressed_size
        if dl_bytes <= _LOCAL_STATS_BYTES:
            total_tokens = sum(
                int(pa.compute.sum(pq.read_table(f, columns=["dl"])["dl"]).as_py() or 0)
                for f in files
            )
        else:
            from ray.data.aggregate import Sum

            stats_row = rd.read_parquet(str(analyzed_dir), columns=["dl"]).aggregate(
                Sum("dl", alias_name="total")
            )
            total_tokens = int(stats_row["total"] or 0)
        manifest.n_docs = n_docs
        manifest.total_tokens = total_tokens
        manifest.avgdl = (total_tokens / n_docs) if n_docs else 0.0
        manifest.record_phase(
            "analyze", n_docs=n_docs, total_tokens=total_tokens,
            seconds=time.perf_counter() - t0,
            map_seconds=t_map_done - t0,
            stats_seconds=time.perf_counter() - t_map_done,
            steal_busy_pct=_steal_share(ticks0),
            spill=_spill_delta(spill0),
            ray_stats=_stats_summary(analyzed),
        )
        manifest.save(index_dir)

    # ---------- phase B: postings shuffle ----------
    if not manifest.phase_complete(generation) and _total_bytes(
        analyzed_dir
    ) <= _SMALL_INPUT_BYTES:
        # small-input reduce: the SAME explode_partials + PostingShardWriter
        # code path, driven in-process — a distributed shuffle would spend
        # seconds of fixed cost moving kilobytes. Results are identical to
        # the Ray path (asserted in tests/test_build.py).
        t0 = time.perf_counter()
        ticks0 = _cpu_ticks()
        spill0 = _spill_counters()
        postings_dir.mkdir(parents=True, exist_ok=True)
        import numpy as np
        import pyarrow.compute as pc

        tbl = pq.read_table(str(analyzed_dir))
        # same hot-term salting decision as the distributed path, driven
        # in-process: exact df per term over the (small) analyzed table
        if (
            salt_target_postings
            and manifest.n_docs > salt_target_postings
            and not manifest.salted_terms
        ):
            import math as _math

            flat = tbl["terms"].combine_chunks().flatten().to_pandas()
            df = flat.value_counts()
            hot = df[df > salt_target_postings]
            manifest.salted_terms = {
                t: min(salt_max, _math.ceil(c / salt_target_postings))
                for t, c in hot.items()
            }
            manifest.save(index_dir)
        salted = dict(manifest.salted_terms)
        parts = [
            explode_partials(tbl.slice(off, 4096), manifest.num_shards, manifest.positional, salted)
            for off in range(0, max(tbl.num_rows, 1), 4096)
        ]
        allp = pa.concat_tables(parts)
        writer = PostingShardWriter(
            str(postings_dir),
            block_size=manifest.block_size,
            avgdl=manifest.avgdl or 1.0,
            k1=manifest.bm25_k1,
            b=manifest.bm25_b,
            positional=manifest.positional,
            resume=resume,
            codec=manifest.codec,
        )
        rows = []
        if allp.num_rows:
            shard_vals = allp["shard"].to_numpy(zero_copy_only=False)
            for s in np.unique(shard_vals):
                grp = allp.filter(pc.equal(allp["shard"], int(s)))
                rows.extend(writer(grp).to_pylist())
        manifest.record_phase(
            generation,
            seconds=time.perf_counter() - t0,
            shards={str(r["shard"]): {k: v for k, v in r.items() if k != "shard"} for r in rows},
            steal_busy_pct=_steal_share(ticks0),
            spill=_spill_delta(spill0),
        )
        manifest.save(index_dir)
    elif not manifest.phase_complete(generation):
        t0 = time.perf_counter()
        ticks0 = _cpu_ticks()
        spill0 = _spill_counters()
        postings_dir.mkdir(parents=True, exist_ok=True)
        # push-based sort shuffle: measurably faster for this wide
        # groupby(shard) exchange (8.3s vs 12.4s pull-based / 62s hash at
        # 120k docs, 32 cpus) and the strategy built for multi-node scale
        ctx = rd.DataContext.get_current()
        prev_strategy = ctx.shuffle_strategy
        try:
            from ray.data.context import ShuffleStrategy

            ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        except ImportError:
            pass
        # head-term salting (SURVEY.md §4 skew): a cheap df pre-aggregation
        # finds terms whose posting list would dominate one reducer; their
        # postings are split across ceil(df/target) salt shards and k-way
        # merged by the query engine (manifest.salted_terms)
        # df ≤ n_docs, so the pre-aggregation can be skipped entirely when
        # no term can possibly exceed the target
        try:
            if (
                salt_target_postings
                and manifest.n_docs > salt_target_postings
                and not manifest.salted_terms
            ):
                manifest.salted_terms = _estimate_hot_terms(
                    str(analyzed_dir), salt_target_postings, salt_max, manifest.n_docs
                )
                manifest.save(index_dir)
            salted = dict(manifest.salted_terms)

            analyzed_ds = rd.read_parquet(str(analyzed_dir))
            # combiner: pre-group postings per (term, batch) so the shuffle
            # sorts ~vocab×batches list-rows instead of one row per posting
            exploded = analyzed_ds.map_batches(
                lambda b: explode_partials(
                    b, manifest.num_shards, manifest.positional, salted,
                    # map-side combiner COMPRESSION: the all-to-all
                    # exchange moves delta+varbyte streams (~1 B/value vs
                    # 4-8 B raw) — at cluster scale the shuffle is
                    # network-bound, so this is a ~4x traffic cut
                    encode=True,
                ),
                batch_format="pyarrow",
            )
            writer = PostingShardWriter(
                str(postings_dir),
                block_size=manifest.block_size,
                avgdl=manifest.avgdl or 1.0,
                k1=manifest.bm25_k1,
                b=manifest.bm25_b,
                positional=manifest.positional,
                resume=resume,
                codec=manifest.codec,
            )
            def write_shard(group: pa.Table) -> pa.Table:
                return writer(group)

            # The encode is memory-bandwidth bound: at high core counts,
            # halving concurrent reducers (num_cpus=2) beats full fan-out
            # (measured 24 s vs 78 s at 400k docs / 32 cpus). At ≤16 cores
            # bandwidth headroom remains (single-threaded clean encode of a
            # median 1M-doc shard is ~1.2 s vs 5-6 s observed at 16-way
            # concurrency under neighbor steal), so full fan-out is the
            # default there. ``reduce_num_cpus`` overrides the adaptive rule.
            import ray

            cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
            if reduce_num_cpus is None:
                reduce_num_cpus = 2 if cluster_cpus > 16 else 1
            lineage = exploded.groupby("shard").map_groups(
                write_shard,
                batch_format="pyarrow",
                num_cpus=reduce_num_cpus,
            )
            rows = lineage.take_all()  # small: one row per shard
        finally:
            ctx.shuffle_strategy = prev_strategy
        manifest.record_phase(
            generation,
            seconds=time.perf_counter() - t0,
            shards={str(r["shard"]): {k: v for k, v in r.items() if k != "shard"} for r in rows},
            steal_busy_pct=_steal_share(ticks0),
            spill=_spill_delta(spill0),
            ray_stats=_stats_summary(lineage),
        )
        manifest.save(index_dir)

    return manifest


def _cpu_ticks() -> tuple[int, int]:
    """(steal, busy) jiffies from /proc/stat — noisy-neighbor attribution
    for the per-phase lineage metrics (north_rule). Steal is normalized
    by BUSY time downstream; idle cores accrue no steal."""
    try:
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        steal = v[7] if len(v) > 7 else 0
        return steal, v[0] + v[1] + v[2] + steal
    except OSError:  # non-Linux: no attribution, phases still recorded
        return 0, 0


def _steal_share(ticks0: tuple[int, int]) -> float:
    """Busy-time steal share (%) since ``ticks0``."""
    s1, b1 = _cpu_ticks()
    return round(100.0 * (s1 - ticks0[0]) / max(b1 - ticks0[1], 1), 2)


_SPILL_PATTERNS = {
    "spill_requests": r"cumulative spill requests: (\d+)",
    "restore_requests": r"cumulative restore requests: (\d+)",
    "bytes_currently_spilled": r"num bytes currently spilled: (\d+)",
    "pinned_bytes": r"pinned objects size: (\d+)",
}


def _spill_counters() -> dict:
    """Object-store spill/restore counters from the raylet's periodic
    ``debug_state.txt`` dump (LocalObjectManager section).

    Distinguishes the designed spill regime (working set > object store,
    throughput drops but the job streams through) from a genuine
    regression — the phase lineage records the spilled/restored deltas so
    a super-linear phase time can be attributed (BASELINE.md, 4M-doc
    datapoint). The grpc-based ``memory_summary`` API is unavailable in
    this container, so this parses the raylet's state file; the dump
    refreshes every ~10 s, so deltas are meaningful only for phases
    longer than that (exactly the spill-regime phases of interest).
    Best-effort: returns {} when the file or fields are absent."""
    try:
        import re

        import ray._private.worker as _w

        session = _w.global_worker.node.get_session_dir_path()
        txt = (Path(session) / "logs" / "debug_state.txt").read_text()
        out = {}
        for key, pat in _SPILL_PATTERNS.items():
            m = re.search(pat, txt)
            if m:
                out[key] = int(m.group(1))
        return out
    except Exception:
        return {}


def _spill_delta(before: dict) -> dict:
    """Per-phase spill/restore counter deltas vs a ``_spill_counters``
    snapshot (cumulative counters → delta; byte gauges → end-of-phase)."""
    after = _spill_counters()
    if not after:
        return {}
    out = {}
    for k in ("spill_requests", "restore_requests"):
        if k in after:
            out[k] = after[k] - before.get(k, 0)
    for k in ("bytes_currently_spilled", "pinned_bytes"):
        if k in after:
            out[k] = after[k]
    return out


def _stats_summary(ds) -> list[str]:
    """Compact per-operator excerpt of ``ds.stats()`` for the manifest —
    per-phase throughput metrics ride with the lineage (north_rule)."""
    try:
        lines = ds.stats().splitlines()
    except Exception:
        return []
    keep = []
    for line in lines:
        ls = line.strip()
        if ls.startswith(("Operator ", "* Remote wall time", "* Output rows",
                          "* Peak heap memory")):
            keep.append(ls[:220])
    return keep[:80]


def _estimate_hot_terms(
    analyzed_dir: str, target: int, salt_max: int, n_docs: int
) -> dict[str, int]:
    """Sampled df estimate for the salting decision (SURVEY.md §4 skew).

    Head terms — df > target, i.e. a constant fraction of the corpus —
    are estimable from a small uniform sample with tiny relative error
    (binomial: at target 250k of 1M docs and a 2 % sample the sampled
    count is ~5000 ± 70, 1.4 %). The n_salts map is a performance
    heuristic: ANY {term: n_salts} yields identical query results (the
    engine k-way merges whatever ``manifest.salted_terms`` records), so
    estimation error only shifts encode balance marginally. This replaces
    a full distributed df scan that cost 10-20 s of fixed pipeline time
    at 1M docs — more than the skew it removed below ~1M postings.

    Files are sampled with a deterministic even stride (reproducible
    builds). Caveat for non-IID corpora (e.g. per-domain files): a
    strided file sample can bias df of domain-local terms, but a term
    must appear in > target docs *globally* to matter, which stride
    sampling across the whole file list still sees.
    """
    import math

    import pandas as pd

    files = sorted(Path(analyzed_dir).glob("*.parquet"))
    if not files:
        return {}
    k = max(4, len(files) // 50)  # ≥4 files, ~2 % of the corpus
    stride = max(1, len(files) // k)
    sample = files[::stride][:k] if len(files) > k else files
    counts: pd.Series | None = None
    rows = 0
    for f in sample:
        t = pq.read_table(f, columns=["terms"])
        rows += t.num_rows
        vc = pd.Series(
            t["terms"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).value_counts()
        counts = vc if counts is None else counts.add(vc, fill_value=0)
    if not rows or counts is None:
        return {}
    est = counts * (n_docs / rows)
    hot = est[est > target]
    return {t: min(salt_max, math.ceil(c / target)) for t, c in hot.items()}


# below this input size, side pipelines (doc store copy, global stats)
# and the postings reduce run in-process: a Ray pipeline's fixed cost
# (executor startup, task round-trips) is seconds while the data is
# kilobytes-to-megabytes. 16 MB ≈ tens of thousands of docs — beyond it
# single-core work would dominate and every stage runs distributed.
_SMALL_INPUT_BYTES = 16 << 20

# the dl stats column is read on the driver while its total compressed
# size stays under this (64 MB compressed ≈ hundreds of millions of
# docs); past it the distributed Sum aggregate takes over
_LOCAL_STATS_BYTES = 64 << 20


def _leaf_column_index(md, name: str) -> int | None:
    """Leaf-column index of a flat column in parquet FileMetaData (for
    per-row-group column byte sizes)."""
    for i in range(md.num_columns):
        if md.schema.column(i).name == name:
            return i
    return None


def _total_bytes(path) -> int:
    paths = path if isinstance(path, (list, tuple)) else [path]
    total = 0
    for p in paths:
        p = Path(p)
        if p.is_dir():
            total += sum(f.stat().st_size for f in p.glob("**/*") if f.is_file())
        elif p.exists():
            total += p.stat().st_size
    return total


def _write_table_atomic(tbl, out_dir: Path, row_group_size: int | None = None) -> None:
    import shutil

    out_dir = Path(out_dir)
    tmp = out_dir.with_name(out_dir.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    if out_dir.exists():
        shutil.rmtree(out_dir)
    tmp.mkdir(parents=True)
    pq.write_table(tbl, tmp / "part-00000.parquet", row_group_size=row_group_size)
    tmp.rename(out_dir)


def _write_parquet_atomic(ds, out_dir: Path, row_group_size: int | None = None) -> None:
    """Write a Dataset to a directory atomically (tmp + rename) so phase
    completion is all-or-nothing."""
    import shutil

    out_dir = Path(out_dir)
    tmp = out_dir.with_name(out_dir.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    if out_dir.exists():
        shutil.rmtree(out_dir)
    if row_group_size is not None:
        ds.write_parquet(str(tmp), row_group_size=row_group_size)
    else:
        ds.write_parquet(str(tmp))
    tmp.rename(out_dir)


def dump_postings(index_dir: str | Path, generation: str = "postings") -> dict:
    """Structural dump oracle (reference test pattern: whole-segment maps,
    ``InvertedIndexManager.getIndexSegment``/``getIndexSegmentPositional``,
    ``InvertedIndexManager.java:725-746, 271-295``): returns
    ``{term: [(doc_id, tf, positions|None), ...]}`` across all shards."""
    import numpy as np

    from ..codec.posting import get_posting_codec

    cod = get_posting_codec(IndexManifest.load(index_dir).codec)
    out: dict[str, list] = {}
    pdir = Path(index_dir) / generation
    for f in sorted(pdir.glob("shard=*.parquet")):
        t = pq.read_table(f)
        for row in t.to_pylist():
            ids = cod.dec_sorted(row["doc_ids"])
            tfs = cod.dec_plain(row["tfs"])
            if row["positions"] is not None:
                pos_all = cod.dec_grouped(row["positions"], tfs)
                bounds = np.cumsum(tfs)
                pos_lists = [
                    pos_all[e - c : e].tolist() for e, c in zip(bounds, tfs)
                ]
            else:
                pos_lists = [None] * len(ids)
            out.setdefault(row["term"], []).extend(
                (int(d), int(tf), p) for d, tf, p in zip(ids, tfs, pos_lists)
            )
    for term in out:
        out[term].sort(key=lambda x: x[0])
    return out
