"""Query engine over the posting-shard index.

Implements the reference's query surface (``InvertedIndexManager.java``):

- keyword / boolean AND / boolean OR (``:476-546``; dedup keywords, analyze
  with the index's chain, per-term posting intersection/union,
  ``InvertedIndex.java:1208-1259``),
- phrase search over positions (``InvertedIndex.java:1261-1345`` —
  consecutive positions p, p+1, …, p+k),
- TF-IDF cosine top-k with the reference's exact formula
  (``idf = log10(N/df + 1)`` with the ``+1`` OUTSIDE the division,
  ``InvertedIndexManager.java:607-611``; per-doc score =
  ``dot/sqrt(len)``, ``InvertedIndex.java:1052-1085``; ``topK=None`` →
  all matches, ``topK=0`` → empty, ``:602-606``),
- BM25 (k1=1.2, b=0.75, ``idf = ln((N-df+0.5)/(df+0.5)+1)``) top-k, both
  exhaustive and block-max WAND pruned (north_rule),
- delete-by-keyword tombstones filtered from every search
  (``InvertedIndexManager.java:677-715``).

Determinism spec (SURVEY.md §7.4): scores accumulate in ascending doc_id
order; ties order by (-score, doc_id). Global stats (N, df, avgdl) come
from the build manifest — no per-query pass over segments.

Reads prune aggressively: a term lookup touches only the term's hash
shard file, filtered on ``term`` (Parquet row-group pruning via the
sorted term column). Decoded term postings are LRU-cached (reference
cache pattern: ``InvertedIndex.java:25-97``).
"""

from __future__ import annotations

import math
import threading
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..analysis.batch import TermMapper, analyze_texts_rowwise
from ..build.manifest import IndexManifest
from ..codec.posting import get_posting_codec
from ..stages.postings import salt_shard, term_shard


@dataclass
class TermPostings:
    term: str
    df: int
    doc_ids: np.ndarray  # int64, sorted ascending (concatenated blocks)
    tfs: np.ndarray
    dls: np.ndarray
    block_bounds: np.ndarray  # prefix offsets per block into doc_ids
    block_max_w: np.ndarray  # float64 per block
    block_doc_max: np.ndarray  # int64 per block (doc_id_max)
    positions_enc: list[bytes | None]  # per block
    codec: object = None  # posting-block codec (set by the engine)
    has_positions: bool = False  # False when loaded column-pruned (BM25 path)

    def positions_for(self, idx: int) -> np.ndarray:
        """Positions of the posting at global index ``idx``."""
        blk = int(np.searchsorted(self.block_bounds, idx, side="right") - 1)
        lo = int(self.block_bounds[blk])
        hi = int(self.block_bounds[blk + 1])
        enc = self.positions_enc[blk]
        if enc is None:
            raise ValueError("index built without positions (positional=False)")
        counts = self.tfs[lo:hi]
        pos_all = self.codec.dec_grouped(enc, counts)
        ends = np.cumsum(counts)
        k = idx - lo
        return pos_all[ends[k] - counts[k] : ends[k]]

    def block_ids(self, blk: int) -> np.ndarray:
        lo, hi = int(self.block_bounds[blk]), int(self.block_bounds[blk + 1])
        return self.doc_ids[lo:hi]

    def block_tf_dl(self, blk: int) -> tuple[np.ndarray, np.ndarray]:
        lo, hi = int(self.block_bounds[blk]), int(self.block_bounds[blk + 1])
        return self.tfs[lo:hi], self.dls[lo:hi]


class LazyTermPostings:
    """Block-lazy postings for a single-source, unsalted term: nothing is
    decoded until touched, and WAND's block skipping never decodes pruned
    blocks (the true block-max value; north_rule). Materializes into flat
    arrays transparently when a caller touches ``doc_ids``/``tfs``/``dls``
    (boolean / exhaustive / phrase paths)."""

    __slots__ = (
        "term", "df", "block_bounds", "block_max_w", "block_doc_max",
        "positions_enc", "codec", "has_positions", "_ids_enc", "_tfs_enc",
        "_dls_enc", "_blk_ids", "_blk_tfdl", "_mat",
    )

    def __init__(self, term: str, rows, codec, bmw_scale: float = 1.0):
        self.term = term
        self.codec = codec
        self.df = int(rows["df"][0].as_py())
        n = rows["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.block_bounds = np.concatenate(([0], np.cumsum(n)))
        self.block_max_w = rows["block_max_w"].to_numpy(zero_copy_only=False)
        if bmw_scale != 1.0:
            # stored maxima were computed with the generation's build-time
            # avgdl; w = tf/(tf + C + D/avgdl) grows at most by
            # avgdl_new/avgdl_old when avgdl rises (denominator shrinks by
            # at most that factor) and never exceeds 1 — rescaled maxima
            # stay sound upper bounds, so WAND stays exact under drift
            self.block_max_w = np.minimum(1.0, self.block_max_w * bmw_scale)
        self.block_doc_max = rows["doc_id_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        self._ids_enc = rows["doc_ids"].to_pylist()
        self._tfs_enc = rows["tfs"].to_pylist()
        self._dls_enc = rows["dls"].to_pylist()
        self.positions_enc = (
            rows["positions"].to_pylist()
            if "positions" in rows.column_names
            else [None] * len(n)
        )
        self.has_positions = any(p is not None for p in self.positions_enc)
        self._blk_ids: dict[int, np.ndarray] = {}
        self._blk_tfdl: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._mat: tuple | None = None

    @property
    def n_blocks(self) -> int:
        return len(self.block_doc_max)

    def block_ids(self, blk: int) -> np.ndarray:
        ids = self._blk_ids.get(blk)
        if ids is None:
            ids = self.codec.dec_sorted(self._ids_enc[blk])
            self._blk_ids[blk] = ids
        return ids

    def block_tf_dl(self, blk: int) -> tuple[np.ndarray, np.ndarray]:
        got = self._blk_tfdl.get(blk)
        if got is None:
            got = (
                self.codec.dec_plain(self._tfs_enc[blk]),
                self.codec.dec_plain(self._dls_enc[blk]),
            )
            self._blk_tfdl[blk] = got
        return got

    def decode_blocks(self, blks) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(ids, tfs, dls) concatenated over ``blks`` (sorted block
        indices) in ONE codec pass per column — per-block byte payloads
        restart their delta chains, so ``dec_sorted_many`` re-anchors
        exactly. Decoded slices are cached for later per-block access."""
        blks = [int(b) for b in blks]
        if not blks:
            z = np.empty(0, np.int64)
            return z, z, z
        if all(b in self._blk_ids and b in self._blk_tfdl for b in blks):
            ids = np.concatenate([self._blk_ids[b] for b in blks])
            tfs = np.concatenate([self._blk_tfdl[b][0] for b in blks])
            dls = np.concatenate([self._blk_tfdl[b][1] for b in blks])
            return ids, tfs, dls
        counts = np.array(
            [int(self.block_bounds[b + 1] - self.block_bounds[b]) for b in blks],
            dtype=np.int64,
        )
        ids = self.codec.dec_sorted_many([self._ids_enc[b] for b in blks], counts)
        tfs = self.codec.dec_plain_many([self._tfs_enc[b] for b in blks], counts)
        dls = self.codec.dec_plain_many([self._dls_enc[b] for b in blks], counts)
        off = np.concatenate(([0], np.cumsum(counts)))
        for i, b in enumerate(blks):
            self._blk_ids[b] = ids[off[i] : off[i + 1]]
            self._blk_tfdl[b] = (tfs[off[i] : off[i + 1]], dls[off[i] : off[i + 1]])
        return ids, tfs, dls

    def _materialize(self):
        if self._mat is None:
            self._mat = self.decode_blocks(range(self.n_blocks))
        return self._mat

    @property
    def doc_ids(self) -> np.ndarray:
        return self._materialize()[0]

    @property
    def tfs(self) -> np.ndarray:
        return self._materialize()[1]

    @property
    def dls(self) -> np.ndarray:
        return self._materialize()[2]

    positions_for = TermPostings.positions_for


class SearchEngine:
    """Driver-side (or per-actor) query engine over one index directory."""

    def __init__(self, index_dir: str | Path, cache_terms: int = 50_000, generation: str = "postings"):
        self.index_dir = Path(index_dir)
        self.manifest = IndexManifest.load(self.index_dir)
        self.mapper = TermMapper(self.manifest.analyzer_mode)
        self.postings_dir = self.index_dir / generation
        self._cache: OrderedDict[str, TermPostings | None] = OrderedDict()
        self._cache_cap = cache_terms
        self._codec = get_posting_codec(self.manifest.codec)
        self._tombstones = np.array(sorted(self.manifest.tombstones), dtype=np.int64)
        # shard-table LRU: small shard files are cached whole so terms
        # hitting the same shard skip the parquet read (cap by file size —
        # big shards at scale fall back to row-group-pruned reads)
        self._shard_cache: OrderedDict[tuple[str, int], object] = OrderedDict()
        # holds a full 128-shard generation of small (≤32 MB) shard files;
        # per-file size gate below bounds the worst case
        self._shard_cache_cap = 192
        self._shard_cache_max_bytes = 32 << 20
        # cold multi-term queries touch one shard file per term: load
        # shards concurrently (parquet read + decompress release the GIL)
        self._shard_cache_lock = threading.Lock()
        # lazy: pipelines construct throwaway engines; a pool per
        # instance would leak 8 idle threads each for the process life
        self._io_pool_inst: ThreadPoolExecutor | None = None

    @property
    def _io_pool(self) -> ThreadPoolExecutor:
        if self._io_pool_inst is None:
            # 16: a salted 4-term query probes ~20 shard files; parquet
            # read + decompress release the GIL, so wider overlap is pure
            # I/O win (cold head-term loads are the p95 driver at 2M docs)
            self._io_pool_inst = ThreadPoolExecutor(max_workers=16)
        return self._io_pool_inst

    def close(self) -> None:
        """Release the shard-IO thread pool (safe to call repeatedly)."""
        if self._io_pool_inst is not None:
            self._io_pool_inst.shutdown(wait=False)
            self._io_pool_inst = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---------- analysis ----------

    def analyze(self, text: str) -> list[str]:
        return analyze_texts_rowwise(text, self.mapper)

    def _analyze_keywords(self, keywords: list[str], dedup: bool) -> list[str]:
        """Reference: dedup raw keywords (HashSet), join with spaces,
        analyze (``InvertedIndexManager.java:490-495``)."""
        kws = list(dict.fromkeys(keywords)) if dedup else list(keywords)
        return self.analyze(" ".join(kws))

    # ---------- posting access ----------

    def num_docs(self) -> int:
        return self.manifest.n_docs

    def doc_frequency(self, term: str) -> int:
        p = self._term(term)
        return p.df if p is not None else 0

    def _term(self, term: str) -> TermPostings | None:
        if term in self._cache:
            self._cache.move_to_end(term)
            return self._cache[term]
        result = self._load_terms([term]).get(term)
        self._put_cache(term, result)
        return result

    def _put_cache(self, term: str, val: TermPostings | None) -> None:
        self._cache[term] = val
        if len(self._cache) > self._cache_cap:
            self._cache.popitem(last=False)

    def _lookup(self, terms: list[str], positions: bool = False) -> dict[str, TermPostings]:
        missing = [
            t
            for t in dict.fromkeys(terms)
            if t not in self._cache
            or (positions and self._cache[t] is not None and not self._cache[t].has_positions)
        ]
        if missing:
            loaded = self._load_terms(missing, positions=positions)
            for t in missing:
                self._put_cache(t, loaded.get(t))
        return {t: self._cache[t] for t in dict.fromkeys(terms) if self._cache.get(t) is not None}

    def _load_terms(self, terms: list[str], positions: bool = False) -> dict[str, TermPostings]:
        """Decode term postings across all index generations.

        Single generation: stored block layout + block-max metadata used
        as-is. Multiple generations (incremental builds,
        ``build/merge.py``): the per-generation sorted runs are k-way
        merged by doc_id and block maxima recomputed exactly with the
        *current* avgdl — keeps block-max WAND bounds sound even when
        avgdl drifted since a generation was built."""
        per_term_rows: dict[str, list] = {}
        plan = list(self._shard_plan(terms).items())
        if len(plan) > 1:
            # executor.map preserves plan order → per-term row order (and
            # therefore assembled postings) is identical to the serial path
            shard_results = self._io_pool.map(
                lambda sv: self._rows_for_shard(sv[0], sv[1], positions), plan
            )
        else:
            shard_results = (self._rows_for_shard(s, ts, positions) for s, ts in plan)
        for triples in shard_results:
            for gen, t, rows in triples:
                per_term_rows.setdefault(t, []).append((gen, rows))
        return {
            t: self._assemble_term(t, gen_rows, positions=positions)
            for t, gen_rows in per_term_rows.items()
        }

    def _shard_plan(self, terms: list[str]) -> dict[int, list[str]]:
        """shard → terms to probe there (salted terms span several)."""
        by_shard: dict[int, list[str]] = {}
        num_shards = self.manifest.num_shards
        salted = self.manifest.salted_terms
        shards = term_shard(np.asarray(terms, dtype=object), num_shards)
        for t, s in zip(terms, shards):
            by_shard.setdefault(int(s), []).append(t)
            for salt in range(salted.get(t, 0)):
                by_shard.setdefault(salt_shard(t, salt, num_shards), []).append(t)
        return {s: list(dict.fromkeys(ts)) for s, ts in by_shard.items()}

    def _rows_for_shard(self, shard: int, ts: list[str], positions: bool) -> list:
        """(gen, term, block-rows) tuples for the given terms in one
        shard, across all generations — the unit of work a shard-owning
        actor serves remotely (``query/service.py``)."""
        out = []
        for gen in list(self.manifest.generations):
            path = self.index_dir / gen / f"shard={shard:05d}.parquet"
            if not path.exists():
                continue
            tbl = self._read_shard(gen, shard, path, ts, positions)
            if tbl is None or tbl.num_rows == 0:
                continue
            for t in ts:
                rows = tbl.filter(pc.equal(tbl["term"], t))
                if rows.num_rows:
                    out.append((gen, t, rows.sort_by([("block_id", "ascending")])))
        return out

    def warm_shards(self, shards: list[int] | None = None) -> int:
        """Prefetch shard tables into the shard-table LRU (cold-start
        killer for routed serving: the first query per shard otherwise
        pays a full ``pq.read_table``). Only files under the per-file
        cache byte ceiling are pulled, newest generation last so it
        survives LRU eviction longest. Returns tables cached."""
        if shards is None:
            shards = list(range(self.manifest.num_shards))
        # collect candidates oldest→newest, then budget the LRU cap
        # from the NEW side: when capacity binds, the newest
        # generations win the slots (and are still inserted last, so
        # they are most-recently-used and survive eviction longest)
        candidates = []
        for gen in list(self.manifest.generations):
            for shard in shards:
                path = self.index_dir / gen / f"shard={shard:05d}.parquet"
                if not path.exists() or (gen, shard) in self._shard_cache:
                    continue
                if path.stat().st_size > self._shard_cache_max_bytes:
                    continue
                candidates.append((gen, shard, path))
        cap_left = self._shard_cache_cap - len(self._shard_cache)
        if cap_left <= 0:
            return 0
        warmed = 0
        for gen, shard, path in candidates[-cap_left:]:
            # re-check under the lock: concurrent _read_shard inserts
            # (or a racing warm_shards) must not push the cache
            # persistently past its cap
            with self._shard_cache_lock:
                if len(self._shard_cache) >= self._shard_cache_cap:
                    break
            tbl = pq.read_table(path)
            with self._shard_cache_lock:
                if len(self._shard_cache) >= self._shard_cache_cap:
                    break
                self._shard_cache[(gen, shard)] = tbl
            warmed += 1
        return warmed

    def _gen_bmw_scale(self, gen: str) -> float:
        """Upper-bound rescale for a generation's stored block maxima when
        the manifest avgdl drifted past the generation's build-time avgdl
        (incremental attach, ``build/merge.py``)."""
        built = self.manifest.phases.get(gen, {}).get("built_avgdl")
        if not built:
            return 1.0
        cur = self.manifest.avgdl or 1.0
        return max(1.0, cur / float(built))

    def _read_shard(self, gen: str, shard: int, path, terms: list[str], positions: bool):
        key = (gen, shard)
        with self._shard_cache_lock:
            cached = self._shard_cache.get(key)
            if cached is not None:
                self._shard_cache.move_to_end(key)
        if cached is not None:
            return cached.filter(pc.field("term").isin(terms))
        if path.stat().st_size <= self._shard_cache_max_bytes:
            tbl = pq.read_table(path)
            with self._shard_cache_lock:
                self._shard_cache[key] = tbl
                if len(self._shard_cache) > self._shard_cache_cap:
                    self._shard_cache.popitem(last=False)
            return tbl.filter(pc.field("term").isin(terms))
        # big shard, uncached: prune the (dominant) positions column when
        # only scoring is needed — SURVEY.md §7.4 "BM25-only scans don't
        # pay for positions"
        cols = None if positions else [
            f.name for f in pq.read_schema(path) if f.name != "positions"
        ]
        return pq.read_table(path, filters=pc.field("term").isin(terms), columns=cols)

    def _assemble_term(self, t: str, gen_rows: list, positions: bool = True):
        cod = self._codec
        # fast path: one source, unsalted → block-lazy postings (nothing
        # decoded until a scorer touches it; WAND skips pruned blocks).
        # Stored block maxima are rescaled if avgdl drifted since this
        # generation was built (attach_generation) — bounds stay sound.
        if len(gen_rows) == 1 and t not in self.manifest.salted_terms:
            gen, rows = gen_rows[0]
            return LazyTermPostings(t, rows, cod, bmw_scale=self._gen_bmw_scale(gen))
        # slow path (salted subsets / multiple generations): k sorted runs
        # merged into one globally doc_id-sorted posting list. Everything
        # is batched — ONE codec pass per column per source (block
        # payloads restart their delta chains, so *_many re-anchors
        # exactly) and numpy group gathers; no per-block Python loops.
        # The head-term cold-load tail at 2M docs was exactly this path
        # (p95 983 ms → see BASELINE.md round 3).
        def _decode_source(item):
            _gen, rows = item
            counts = rows["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            ids = cod.dec_sorted_many(rows["doc_ids"].to_pylist(), counts)
            tfs_ = cod.dec_plain_many(rows["tfs"].to_pylist(), counts)
            dls_ = cod.dec_plain_many(rows["dls"].to_pylist(), counts)
            if positions and "positions" in rows.column_names:
                bufs = rows["positions"].to_pylist()
                pos = None if any(b is None for b in bufs) else bufs
            else:
                pos = None
            return ids, tfs_, dls_, pos

        # head terms span many salt subsets / generations — decode the
        # sources concurrently on the IO pool (numpy varbyte kernels
        # release the GIL for the bulk of the work); order preserved
        if len(gen_rows) > 2:
            decoded = list(self._io_pool.map(_decode_source, gen_rows))
        else:
            decoded = [_decode_source(it) for it in gen_rows]
        ids_srcs = [d[0] for d in decoded]
        tf_srcs = [d[1] for d in decoded]
        dl_srcs = [d[2] for d in decoded]
        pos_srcs = [d[3] for d in decoded]
        doc_ids = np.concatenate(ids_srcs)
        tfs = np.concatenate(tf_srcs).astype(np.int64, copy=False)
        dls = np.concatenate(dl_srcs)
        order = np.argsort(doc_ids, kind="stable")
        want_pos = positions and all(p is not None for p in pos_srcs)
        if want_pos:
            # one grouped decode per source (each block's encoding
            # restarts at every posting), then one vectorized group
            # gather reorders per-posting position runs into merge order
            pos_flat = np.concatenate(
                [
                    cod.dec_grouped(b"".join(bufs), tf_src)
                    for bufs, tf_src in zip(pos_srcs, tf_srcs)
                ]
            ) if len(tfs) else np.empty(0, np.int64)
            starts = np.cumsum(tfs) - tfs
            sel_starts, sel_counts = starts[order], tfs[order]
            total = int(sel_counts.sum())
            out_starts = np.cumsum(sel_counts) - sel_counts
            delta = np.arange(total, dtype=np.int64) - np.repeat(out_starts, sel_counts)
            pos_sorted = pos_flat[np.repeat(sel_starts, sel_counts) + delta]
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        bs = self.manifest.block_size
        k1, b = self.manifest.bm25_k1, self.manifest.bm25_b
        avgdl = self.manifest.avgdl or 1.0
        w = tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        n = len(doc_ids)
        n_blocks = (n + bs - 1) // bs
        block_bounds = np.minimum(np.arange(n_blocks + 1) * bs, n)
        block_max_w = (
            np.maximum.reduceat(w, block_bounds[:-1]) if n else np.empty(0)
        )
        block_doc_max = doc_ids[np.minimum(block_bounds[1:] - 1, n - 1)] if n else np.empty(0, np.int64)
        if want_pos:
            # batched per-block re-encode: one numpy delta/varbyte pass,
            # sliced at the block boundaries (in position-value space)
            starts_mask = np.zeros(len(pos_sorted), dtype=bool)
            if len(pos_sorted):
                starts_mask[np.cumsum(tfs) - tfs] = True
            val_bounds = np.concatenate(([0], np.cumsum(tfs)))[block_bounds]
            pos_enc: list[bytes | None] = cod.enc_grouped_blocks(
                pos_sorted, starts_mask, val_bounds.astype(np.int64)
            )
        else:
            pos_enc = [None] * n_blocks
        return TermPostings(
            term=t,
            df=n,
            doc_ids=doc_ids,
            tfs=tfs,
            dls=dls,
            block_bounds=block_bounds.astype(np.int64),
            block_max_w=block_max_w,
            block_doc_max=np.asarray(block_doc_max, dtype=np.int64),
            positions_enc=pos_enc,
            codec=cod,
            has_positions=want_pos,
        )

    def _remove_tombstones(self, doc_ids: np.ndarray) -> np.ndarray:
        if len(self._tombstones) == 0 or len(doc_ids) == 0:
            return doc_ids
        return doc_ids[~np.isin(doc_ids, self._tombstones, assume_unique=False)]

    # ---------- boolean search ----------

    def search_keyword(self, keyword: str) -> np.ndarray:
        """Single-keyword search (reference ``searchQuery(String)`` → AND of
        its analyzed tokens)."""
        return self.search_and([keyword])

    def search_and(self, keywords: list[str]) -> np.ndarray:
        tokens = self._analyze_keywords(keywords, dedup=True)
        if not tokens:
            return np.empty(0, dtype=np.int64)
        posts = self._lookup(tokens)
        if len(posts) < len(set(tokens)):
            return np.empty(0, dtype=np.int64)  # a term with no postings
        acc: np.ndarray | None = None
        for t in dict.fromkeys(tokens):
            ids = posts[t].doc_ids
            acc = ids if acc is None else acc[np.isin(acc, ids, assume_unique=True)]
            if len(acc) == 0:
                break
        return self._remove_tombstones(acc)

    def search_or(self, keywords: list[str]) -> np.ndarray:
        tokens = self._analyze_keywords(keywords, dedup=True)
        if not tokens:
            return np.empty(0, dtype=np.int64)
        posts = self._lookup(tokens)
        if not posts:
            return np.empty(0, dtype=np.int64)
        acc = np.unique(np.concatenate([p.doc_ids for p in posts.values()]))
        return self._remove_tombstones(acc)

    def search_not(self, keywords: list[str], exclude: list[str]) -> np.ndarray:
        """Boolean AND-NOT: docs matching all of ``keywords`` and none of
        ``exclude`` (SQL ``INTERSECT ... EXCEPT`` semantics)."""
        inc = self.search_and(keywords)
        if len(inc) == 0:
            return inc
        exc_tokens = self._analyze_keywords(exclude, dedup=True)
        posts = self._lookup(exc_tokens)
        if posts:
            excl = np.unique(
                np.concatenate([p.doc_ids for p in posts.values()])
            )
            inc = inc[~np.isin(inc, excl, assume_unique=True)]
        return inc

    def prefix_terms(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Term completion: the ``k`` highest-df dictionary terms starting
        with ``prefix`` (ties by term ascending).

        Touches only the dictionary metadata: every shard file is read
        with a ``term`` range filter + ``block_id == 0`` (one row per
        term), columns pruned to (term, df) — the term-sorted shard
        layout (K5) makes this a row-group-pruned scan, no postings are
        decoded. df is summed across generations and salted subsets.
        """
        if not prefix:
            raise ValueError("empty prefix")
        hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
        filt = (
            (pc.field("term") >= prefix)
            & (pc.field("term") < hi)
            & (pc.field("block_id") == 0)
        )
        paths = [
            p
            for gen in list(self.manifest.generations)
            for p in sorted((self.index_dir / gen).glob("shard=*.parquet"))
        ]
        tables = self._io_pool.map(
            lambda p: pq.read_table(p, filters=filt, columns=["term", "df"]), paths
        )
        acc: dict[str, int] = {}
        for tbl in tables:
            for t, df in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
                acc[t] = acc.get(t, 0) + int(df)
        top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return top

    def infix_terms(self, needle: str, k: int = 10) -> list[tuple[str, int]]:
        """Wildcard (*needle*) term lookup: the ``k`` highest-df
        dictionary terms CONTAINING ``needle`` (ties by term ascending).
        Unlike :meth:`prefix_terms` the term-sorted layout can't prune a
        contains predicate, so this is the honest full-dictionary
        metadata scan (block_id == 0 rows, (term, df) columns only) —
        still vocabulary-sized, postings never load."""
        if not needle:
            raise ValueError("empty needle")
        filt = pc.field("block_id") == 0
        paths = [
            p
            for gen in list(self.manifest.generations)
            for p in sorted((self.index_dir / gen).glob("shard=*.parquet"))
        ]
        tables = self._io_pool.map(
            lambda p: pq.read_table(p, filters=filt, columns=["term", "df"]), paths
        )
        acc: dict[str, int] = {}
        for tbl in tables:
            mask = pc.match_substring(tbl["term"], needle)
            sub = tbl.filter(mask)
            for t, df in zip(sub["term"].to_pylist(), sub["df"].to_pylist()):
                acc[t] = acc.get(t, 0) + int(df)
        return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def doc_terms(self, doc_id: int) -> list[str]:
        """Distinct analyzed terms of one document — a doc_id-filtered
        point read of the (doc_id-sorted) ``analyzed/`` table, row-group
        pruned; spans all attached generations (increments merge their
        analyzed files into the same directory)."""
        tbl = pq.read_table(
            self.index_dir / "analyzed",
            filters=pc.field("doc_id") == doc_id,
            columns=["terms"],
        )
        if tbl.num_rows == 0:
            return []
        return tbl["terms"][0].as_py()

    def more_like_this(self, doc_id: int, k: int = 10) -> list[tuple[int, int]]:
        """Docs sharing the most distinct terms with ``doc_id`` (the
        classic term-overlap "more like this"): one postings lookup per
        source term, one bincount over the concatenated doc-id lists —
        no text re-analysis, no scan. Returns (doc_id, overlap) sorted
        by (-overlap, doc_id), excluding the source doc."""
        terms = self.doc_terms(doc_id)
        if not terms:
            return []
        posts = self._lookup(terms)
        if not posts:
            return []
        ids = np.concatenate([p.doc_ids for p in posts.values()])
        ids = self._remove_tombstones(ids)
        uniq, overlap = np.unique(ids, return_counts=True)
        keep = uniq != doc_id
        uniq, overlap = uniq[keep], overlap[keep]
        if len(uniq) == 0:
            return []
        order = np.lexsort((uniq, -overlap))[:k]
        return [(int(uniq[i]), int(overlap[i])) for i in order]

    # ---------- phrase search ----------

    def search_phrase(self, phrase: str | list[str]) -> np.ndarray:
        """Docs containing the analyzed tokens at consecutive positions
        (reference ``InvertedIndex.searchPhrase``; requires positional
        index, ``InvertedIndexManager.java:233-259``)."""
        if not self.manifest.positional:
            raise RuntimeError("phrase search requires a positional index")
        text = phrase if isinstance(phrase, str) else " ".join(phrase)
        tokens = self.analyze(text)
        if not tokens:
            return np.empty(0, dtype=np.int64)
        posts = self._lookup(tokens, positions=True)
        if len(posts) < len(set(tokens)):
            return np.empty(0, dtype=np.int64)
        # candidates: docs containing every token
        cand: np.ndarray | None = None
        for t in dict.fromkeys(tokens):
            ids = posts[t].doc_ids
            cand = ids if cand is None else cand[np.isin(cand, ids, assume_unique=True)]
        cand = self._remove_tombstones(cand)
        if not len(cand):
            return np.empty(0, dtype=np.int64)
        # Block-vectorized adjacency (reference semantics anchor:
        # ``InvertedIndex.java:1261-1345``): for each phrase token at
        # offset j, gather candidate docs' positions block by block —
        # each positions block decoded exactly ONCE — as composite
        # (candidate ordinal) << 32 | (position - j) keys; docs where the
        # intersection of all tokens' key sets is non-empty contain the
        # phrase. Replaces the per-candidate decode loop (≈10× on head
        # phrases).
        SHIFT = np.int64(1) << np.int64(32)
        OFF = np.int64(1) << np.int64(16)  # keeps position - j positive
        keys: np.ndarray | None = None
        for j, t in enumerate(tokens):
            doc_part, pos_part = self._gather_candidate_positions(posts[t], cand)
            if not len(doc_part):
                return np.empty(0, dtype=np.int64)
            k = doc_part * SHIFT + (pos_part - np.int64(j) + OFF)
            keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
            if keys is not None and not len(keys):
                return np.empty(0, dtype=np.int64)
        hits_ord = np.unique(keys >> np.int64(32))
        return cand[hits_ord].astype(np.int64)

    def _gather_candidate_positions(
        self, p, cand: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """All (candidate ordinal, token position) pairs of term ``p`` at
        the candidate docs (every candidate MUST contain the term) —
        positions blocks decoded exactly once each, no per-doc loop."""
        cand_ord = np.arange(len(cand), dtype=np.int64)
        idxs = np.searchsorted(p.doc_ids, cand)
        blocks = np.searchsorted(p.block_bounds, idxs, side="right") - 1
        doc_parts, pos_parts = [], []
        for blk in np.unique(blocks):
            in_blk = blocks == blk
            local = idxs[in_blk] - int(p.block_bounds[blk])
            cidx = cand_ord[in_blk]
            enc = p.positions_enc[blk]
            if enc is None:
                raise ValueError("index built without positions (positional=False)")
            tfs_b = np.asarray(p.block_tf_dl(int(blk))[0], dtype=np.int64)
            pos_all = p.codec.dec_grouped(enc, tfs_b)
            ends = np.cumsum(tfs_b)
            starts = ends - tfs_b
            lengths = tfs_b[local]
            total = int(lengths.sum())
            if total == 0:
                continue
            out_starts = np.cumsum(lengths) - lengths
            gidx = np.arange(total, dtype=np.int64) + np.repeat(
                starts[local] - out_starts, lengths
            )
            pos_parts.append(np.asarray(pos_all, dtype=np.int64)[gidx])
            doc_parts.append(np.repeat(cidx, lengths))
        if not doc_parts:
            z = np.empty(0, np.int64)
            return z, z
        return np.concatenate(doc_parts), np.concatenate(pos_parts)

    def search_near(self, term_a: str, term_b: str, slop: int) -> np.ndarray:
        """Proximity search: docs where an occurrence of ``term_a`` lies
        within ``slop`` analyzed-token positions of one of ``term_b``
        (Lucene-style NEAR; positions are post-stopword analyzed
        offsets). Vectorized: composite (doc, pos) keys for both terms,
        one searchsorted finds each b-occurrence's nearest a-neighbors."""
        if not self.manifest.positional:
            raise RuntimeError("proximity search requires a positional index")
        ta, tb = self.analyze(term_a), self.analyze(term_b)
        if len(ta) != 1 or len(tb) != 1:
            raise ValueError("search_near takes single analyzable terms")
        posts = self._lookup([ta[0], tb[0]], positions=True)
        if ta[0] not in posts or tb[0] not in posts:
            return np.empty(0, dtype=np.int64)
        pa_, pb_ = posts[ta[0]], posts[tb[0]]
        cand = pa_.doc_ids[np.isin(pa_.doc_ids, pb_.doc_ids, assume_unique=True)]
        cand = self._remove_tombstones(cand)
        if not len(cand):
            return np.empty(0, dtype=np.int64)
        SHIFT = np.int64(1) << np.int64(32)
        da, pos_a = self._gather_candidate_positions(pa_, cand)
        db, pos_b = self._gather_candidate_positions(pb_, cand)
        ka = da * SHIFT + pos_a  # sorted: gather emits (doc, pos) ascending
        kb = db * SHIFT + pos_b
        ins = np.searchsorted(ka, kb)
        hit = np.zeros(len(kb), dtype=bool)
        left = np.maximum(ins - 1, 0)
        hit |= (da[left] == db) & (np.abs(pos_b - pos_a[left]) <= slop)
        right = np.minimum(ins, len(ka) - 1)
        hit |= (da[right] == db) & (np.abs(pos_a[right] - pos_b) <= slop)
        hits_ord = np.unique(db[hit])
        return cand[hits_ord].astype(np.int64)

    def min_term_distance(self, term_a: str, term_b: str) -> tuple[np.ndarray, np.ndarray]:
        """Per-doc minimum |pos_a − pos_b| over all occurrence pairs, for
        docs containing BOTH terms — the proximity signal for ranking
        (same composite-key searchsorted as :meth:`search_near`: each
        b-occurrence's nearest a-neighbor bounds the doc minimum).
        Returns (doc_ids, min_dist), doc_ids ascending."""
        if not self.manifest.positional:
            raise RuntimeError("proximity ranking requires a positional index")
        ta, tb = self.analyze(term_a), self.analyze(term_b)
        if len(ta) != 1 or len(tb) != 1:
            raise ValueError("min_term_distance takes single analyzable terms")
        posts = self._lookup([ta[0], tb[0]], positions=True)
        if ta[0] not in posts or tb[0] not in posts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        pa_, pb_ = posts[ta[0]], posts[tb[0]]
        cand = pa_.doc_ids[np.isin(pa_.doc_ids, pb_.doc_ids, assume_unique=True)]
        cand = self._remove_tombstones(cand)
        if not len(cand):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        SHIFT = np.int64(1) << np.int64(32)
        da, pos_a = self._gather_candidate_positions(pa_, cand)
        db, pos_b = self._gather_candidate_positions(pb_, cand)
        ka = da * SHIFT + pos_a
        kb = db * SHIFT + pos_b
        ins = np.searchsorted(ka, kb)
        best = np.full(len(kb), np.iinfo(np.int64).max)
        left = np.maximum(ins - 1, 0)
        ok = da[left] == db
        best[ok] = np.abs(pos_b - pos_a[left])[ok]
        right = np.minimum(ins, len(ka) - 1)
        ok = da[right] == db
        best[ok] = np.minimum(best[ok], np.abs(pos_a[right] - pos_b)[ok])
        out = np.full(len(cand), np.iinfo(np.int64).max)
        np.minimum.at(out, db, best)
        return cand.astype(np.int64), out

    # ---------- TF-IDF (reference formula) ----------

    def search_tfidf(self, keywords: list[str], topk: int | None) -> list[tuple[int, float]]:
        """Reference ``searchTfIdf`` (``InvertedIndexManager.java:578-645``):
        cosine against an un-normalized query tf-idf vector. Returns
        (doc_id, score) sorted by (-score, doc_id)."""
        tokens = self.analyze(" ".join(keywords))
        if topk is not None and topk == 0:
            return []
        if not tokens:
            return []
        posts = self._lookup(tokens)
        n = self.num_docs()
        # global idf; terms absent everywhere are skipped in scoring
        idf = {
            t: math.log10(n / posts[t].df + 1) for t in posts
        }
        qtf: dict[str, int] = {}
        for t in tokens:
            qtf[t] = qtf.get(t, 0) + 1
        # vectorized accumulation; per-doc addition order equals the
        # reference's (query-token order), so scores are bit-identical
        terms_present = [t for t in dict.fromkeys(tokens) if t in posts]
        if not terms_present:
            return []
        all_ids, all_contrib, all_sq = [], [], []
        for t in terms_present:
            p = posts[t]
            w_q = qtf[t] * idf[t]
            tfidf = p.tfs * idf[t]
            all_ids.append(p.doc_ids)
            all_contrib.append(tfidf * w_q)
            all_sq.append(tfidf * tfidf)
        ids = np.concatenate(all_ids)
        uids, inv = np.unique(ids, return_inverse=True)
        dot = np.zeros(len(uids))
        length = np.zeros(len(uids))
        np.add.at(dot, inv, np.concatenate(all_contrib))
        np.add.at(length, inv, np.concatenate(all_sq))
        keep = length > 0
        if len(self._tombstones):
            keep &= ~np.isin(uids, self._tombstones)
        uids, dot, length = uids[keep], dot[keep], length[keep]
        score_vals = dot / np.sqrt(length)
        order = np.lexsort((uids, -score_vals))
        if topk is not None:
            order = order[:topk]
        return [(int(uids[i]), float(score_vals[i])) for i in order]

    # ---------- query likelihood (Dirichlet smoothing) ----------

    def search_ql_dirichlet(
        self, query: str | list[str], mu: float = 2000.0, topk: int | None = None
    ) -> list[tuple[int, float]]:
        """Query-likelihood ranking with Dirichlet-prior smoothing
        (Zhai & Lafferty 2001): score(d) = Σ_q qn · ln((tf + μ·cf_t/|C|)
        / (dl_d + μ)) over the distinct query terms present in the
        collection, for every doc containing ≥1 query term. cf_t is the
        exact collection frequency (sum of the term's posting tfs — the
        postings cover the whole corpus) and |C| is the manifest's exact
        ``total_tokens``. Docs missing a term still receive its smoothed
        background mass, so the zero-tf contribution is computed dense
        over the candidate union. Returns (doc_id, score) sorted by
        (-score, doc_id)."""
        text = query if isinstance(query, str) else " ".join(query)
        tokens = self.analyze(text)
        if topk is not None and topk == 0:
            return []
        if not tokens:
            return []
        posts = self._lookup(tokens)
        terms = [t for t in dict.fromkeys(tokens) if t in posts]
        if not terms:
            return []
        qtf: dict[str, int] = {}
        for t in tokens:
            qtf[t] = qtf.get(t, 0) + 1
        total = float(self.manifest.total_tokens) or 1.0
        # candidate union + per-candidate doc length (gathered from any
        # posting where the doc occurs — dls is replicated per posting)
        uids = np.unique(np.concatenate([posts[t].doc_ids for t in terms]))
        if len(self._tombstones):
            uids = uids[~np.isin(uids, self._tombstones)]
        if not len(uids):
            return []
        dl = np.zeros(len(uids), dtype=np.float64)
        for t in terms:
            p = posts[t]
            pos = np.searchsorted(uids, p.doc_ids)
            ok = pos < len(uids)
            dl[pos[ok]] = p.dls[ok]
        scores = np.zeros(len(uids), dtype=np.float64)
        denom = dl + mu
        for t in terms:
            p = posts[t]
            cf = float(p.tfs.sum())
            bg = mu * (cf / total)
            tf_dense = np.zeros(len(uids), dtype=np.float64)
            pos = np.searchsorted(uids, p.doc_ids)
            tf_dense[pos] = p.tfs
            scores += qtf[t] * np.log((tf_dense + bg) / denom)
        return self._topk_by_score(uids, scores, topk)

    def search_ql_jm(
        self, query: str | list[str], lam: float = 0.5, topk: int | None = None
    ) -> list[tuple[int, float]]:
        """Query-likelihood ranking with Jelinek-Mercer (linear
        interpolation) smoothing (Zhai & Lafferty 2001): score(d) =
        Σ_q qn · ln(λ·tf/dl + (1−λ)·cf_t/|C|) — the fixed-mix
        counterpart to :meth:`search_ql_dirichlet` (which adapts the mix
        to document length). Same candidate-union / dense zero-tf
        machinery; cf from the posting tfs, |C| from the manifest."""
        text = query if isinstance(query, str) else " ".join(query)
        tokens = self.analyze(text)
        if topk is not None and topk == 0:
            return []
        if not tokens:
            return []
        posts = self._lookup(tokens)
        terms = [t for t in dict.fromkeys(tokens) if t in posts]
        if not terms:
            return []
        qtf: dict[str, int] = {}
        for t in tokens:
            qtf[t] = qtf.get(t, 0) + 1
        total = float(self.manifest.total_tokens) or 1.0
        uids = np.unique(np.concatenate([posts[t].doc_ids for t in terms]))
        if len(self._tombstones):
            uids = uids[~np.isin(uids, self._tombstones)]
        if not len(uids):
            return []
        dl = np.zeros(len(uids), dtype=np.float64)
        for t in terms:
            p = posts[t]
            pos = np.searchsorted(uids, p.doc_ids)
            ok = pos < len(uids)
            dl[pos[ok]] = p.dls[ok]
        scores = np.zeros(len(uids), dtype=np.float64)
        for t in terms:
            p = posts[t]
            cf = float(p.tfs.sum())
            bg = (1.0 - lam) * cf / total
            tf_dense = np.zeros(len(uids), dtype=np.float64)
            pos = np.searchsorted(uids, p.doc_ids)
            tf_dense[pos] = p.tfs
            scores += qtf[t] * np.log(lam * (tf_dense / dl) + bg)
        return self._topk_by_score(uids, scores, topk)

    def search_dfr_pl2(
        self, query: str | list[str], c: float = 1.0, topk: int | None = None
    ) -> list[tuple[int, float]]:
        """Divergence-from-randomness PL2 ranking (Amati & van
        Rijsbergen, TOIS 2002: Poisson randomness model, Laplace
        after-effect, length normalisation 2 — the third classic scoring
        family beside BM25 and query likelihood). Per query term with
        tf>0:

            tfn  = tf · log2(1 + c·avgdl/dl)
            λ    = F_t / N                  (collection frequency / docs)
            s    = qn/(tfn+1) · (tfn·log2(tfn/λ) + (λ−tfn)·log2(e)
                                 + 0.5·log2(2π·tfn))

        Docs missing a term contribute nothing for it (no smoothing —
        unlike QL the information content of an unseen term is zero).
        avgdl/N/F all come from the index artifacts; returns
        (doc_id, score) sorted by (-score, doc_id).

        Collection-stats note (shared by every scorer here — QL/DFR/
        pivoted/BM25 idf): N, avgdl, F_t and df are GENERATION-LEVEL,
        i.e. tombstone-INCLUSIVE — tombstoned docs are filtered from
        the candidates but still count in the background statistics.
        All scorers drift identically after deletes, so cross-scorer
        rank comparisons stay consistent, and a compaction refreshes
        every statistic at once (``build/merge.py::compact`` recomputes
        n_docs/avgdl from live docs and df per merged term)."""
        text = query if isinstance(query, str) else " ".join(query)
        tokens = self.analyze(text)
        if topk is not None and topk == 0:
            return []
        if not tokens:
            return []
        posts = self._lookup(tokens)
        terms = [t for t in dict.fromkeys(tokens) if t in posts]
        if not terms:
            return []
        qtf: dict[str, int] = {}
        for t in tokens:
            qtf[t] = qtf.get(t, 0) + 1
        n = float(self.num_docs()) or 1.0
        avgdl = self.manifest.avgdl or 1.0
        log2e = 1.0 / math.log(2.0)
        uids = np.unique(np.concatenate([posts[t].doc_ids for t in terms]))
        if len(self._tombstones):
            uids = uids[~np.isin(uids, self._tombstones)]
        if not len(uids):
            return []
        scores = np.zeros(len(uids), dtype=np.float64)
        for t in terms:
            p = posts[t]
            keep = np.ones(len(p.doc_ids), bool)
            if len(self._tombstones):
                keep = ~np.isin(p.doc_ids, self._tombstones)
            lam = float(p.tfs.sum()) / n
            tfn = p.tfs[keep] * np.log2(1.0 + c * avgdl / p.dls[keep])
            gain = (
                qtf[t]
                / (tfn + 1.0)
                * (
                    tfn * np.log2(tfn / lam)
                    + (lam - tfn) * log2e
                    + 0.5 * np.log2(2.0 * math.pi * tfn)
                )
            )
            pos = np.searchsorted(uids, p.doc_ids[keep])
            np.add.at(scores, pos, gain)
        return self._topk_by_score(uids, scores, topk)

    def search_pivoted(
        self, query: str | list[str], s: float = 0.2, topk: int | None = None
    ) -> list[tuple[int, float]]:
        """Pivoted length-normalisation ranking (Singhal, Buckley &
        Mitra, SIGIR 1996 — the fix for plain cosine's short-document
        bias that BM25's b generalises). Per query term with tf>0:

            w = qn · (1 + ln(1 + ln(tf))) / ((1−s) + s·dl/avgdl)
                   · ln((N+1)/df)

        Sparse contributions only (no smoothing); avgdl/N/df from the
        index artifacts; returns (doc_id, score) sorted by
        (-score, doc_id)."""
        text = query if isinstance(query, str) else " ".join(query)
        tokens = self.analyze(text)
        if topk is not None and topk == 0:
            return []
        if not tokens:
            return []
        posts = self._lookup(tokens)
        terms = [t for t in dict.fromkeys(tokens) if t in posts]
        if not terms:
            return []
        qtf: dict[str, int] = {}
        for t in tokens:
            qtf[t] = qtf.get(t, 0) + 1
        n = float(self.num_docs()) or 1.0
        avgdl = self.manifest.avgdl or 1.0
        uids = np.unique(np.concatenate([posts[t].doc_ids for t in terms]))
        if len(self._tombstones):
            uids = uids[~np.isin(uids, self._tombstones)]
        if not len(uids):
            return []
        scores = np.zeros(len(uids), dtype=np.float64)
        for t in terms:
            p = posts[t]
            keep = np.ones(len(p.doc_ids), bool)
            if len(self._tombstones):
                keep = ~np.isin(p.doc_ids, self._tombstones)
            idf = math.log((n + 1.0) / p.df)
            gain = (
                qtf[t]
                * (1.0 + np.log(1.0 + np.log(p.tfs[keep])))
                / ((1.0 - s) + s * p.dls[keep] / avgdl)
                * idf
            )
            pos = np.searchsorted(uids, p.doc_ids[keep])
            np.add.at(scores, pos, gain)
        return self._topk_by_score(uids, scores, topk)

    def search_bm25_filtered(
        self,
        query: str | list[str],
        allowed: np.ndarray,
        topk: int | None = None,
    ) -> list[tuple[int, float]]:
        """BM25 restricted to a metadata-selected doc set (filtered
        search — e.g. lang='en'): ``allowed`` is a SORTED int64 array of
        permitted doc ids (at cluster scale, a broadcast bitmap built
        once from the metadata table's pruned columns). Postings are
        filtered BEFORE scoring, so excluded docs cost nothing past the
        membership probe; df/avgdl stay corpus-level — standard
        filtered-search semantics, and per-doc float ops are identical
        to the unfiltered scorer (verified post-filter-identical in
        tests)."""
        text = query if isinstance(query, str) else " ".join(query)
        tokens = self.analyze(text)
        if topk is not None and topk == 0:
            return []
        if not tokens:
            return []
        posts = self._lookup(tokens)
        if not posts:
            return []
        qtf: dict[str, int] = {}
        for t in tokens:
            qtf[t] = qtf.get(t, 0) + 1
        weights = self._bm25_weights(posts, qtf)
        terms = [t for t in dict.fromkeys(tokens) if t in posts]
        ids_l, w_l = [], []
        for t in terms:
            p = posts[t]
            pos = np.searchsorted(allowed, p.doc_ids)
            pos_c = np.minimum(pos, len(allowed) - 1) if len(allowed) else pos
            member = (
                allowed[pos_c] == p.doc_ids if len(allowed) else np.zeros(len(p.doc_ids), bool)
            )
            ids_l.append(p.doc_ids[member])
            w_l.append(weights[t][member])
        all_ids = np.concatenate(ids_l) if ids_l else np.empty(0, np.int64)
        if not len(all_ids):
            return []
        all_w = np.concatenate(w_l)
        uids, inv = np.unique(all_ids, return_inverse=True)
        scores = np.zeros(len(uids))
        np.add.at(scores, inv, all_w)
        if len(self._tombstones):
            keep = ~np.isin(uids, self._tombstones)
            uids, scores = uids[keep], scores[keep]
        return self._topk_by_score(uids, scores, topk)

    def _is_tombstone(self, doc: int) -> bool:
        if len(self._tombstones) == 0:
            return False
        i = int(np.searchsorted(self._tombstones, doc))
        return i < len(self._tombstones) and self._tombstones[i] == doc

    # ---------- BM25 ----------

    def bm25_idf(self, df: int) -> float:
        n = self.num_docs()
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def search_bm25(
        self, query: str | list[str], topk: int | None = 10, method: str = "auto"
    ) -> list[tuple[int, float]]:
        """BM25 top-k (k1/b from the manifest). ``method``: "wand" =
        block-max WAND pruning; "exhaustive" = vectorized full scoring;
        "auto" picks by candidate volume. Identical results by
        construction (verified in tests)."""
        text = query if isinstance(query, str) else " ".join(query)
        tokens = self.analyze(text)
        if topk is not None and topk == 0:
            return []
        if not tokens:
            return []
        posts = self._lookup(tokens)
        if not posts:
            return []
        if method == "auto":
            # Selective queries (one term much rarer than the rest, small
            # k) take the vectorized block-max MaxScore path: common
            # terms' postings are pruned at block granularity, so their
            # blocks are mostly never decoded. Dense queries take the
            # exhaustive scorer (one np.add.at beats pivot stepping when
            # everything must be decoded anyway). Pivot-based WAND stays
            # available explicitly (method="wand") — all three are
            # bit-identical (verified in tests).
            dfs = [posts[t].df for t in dict.fromkeys(tokens) if t in posts]
            selective = (
                topk is not None
                and topk <= 1000
                and len(dfs) >= 2
                and min(dfs) * 4 <= max(dfs)
            )
            method = "maxscore" if selective else "exhaustive"
        if method == "maxscore" and topk is not None:
            out = self._bm25_maxscore(tokens, posts, topk)
            if out is not None:
                return out
            method = "exhaustive"  # no pruning opportunity — fall back
        if topk is None or method == "exhaustive":
            return self._bm25_exhaustive(tokens, posts, topk)
        return self._bm25_wand(tokens, posts, topk)

    def _bm25_weights(self, posts: dict[str, TermPostings], qtf: dict[str, int]):
        k1, b = self.manifest.bm25_k1, self.manifest.bm25_b
        avgdl = self.manifest.avgdl or 1.0
        out = {}
        for t, p in posts.items():
            idf = self.bm25_idf(p.df)
            w = p.tfs / (p.tfs + k1 * (1.0 - b + b * p.dls / avgdl))
            out[t] = (k1 + 1.0) * idf * w * qtf.get(t, 1)
        return out

    def _bm25_exhaustive(self, tokens, posts, topk):
        """Vectorized: one np.add.at accumulation over the concatenated
        posting lists. Addition order per doc equals the per-term loop's
        (terms in query order), so scores are bit-identical to the oracle."""
        qtf: dict[str, int] = {}
        for t in tokens:
            qtf[t] = qtf.get(t, 0) + 1
        weights = self._bm25_weights(posts, qtf)
        terms = [t for t in dict.fromkeys(tokens) if t in posts]
        if not terms:
            return []
        all_ids = np.concatenate([posts[t].doc_ids for t in terms])
        all_w = np.concatenate([weights[t] for t in terms])
        uids, inv = np.unique(all_ids, return_inverse=True)
        # bincount accumulates in input order per bin — the same float-op
        # order as np.add.at / the per-term oracle loop (bit-identical)
        scores = np.bincount(inv, weights=all_w, minlength=len(uids))
        if len(self._tombstones):
            keep = ~np.isin(uids, self._tombstones)
            uids, scores = uids[keep], scores[keep]
        return self._topk_by_score(uids, scores, topk)

    @staticmethod
    def _topk_by_score(uids: np.ndarray, scores: np.ndarray, topk: int | None):
        """Exact top-k by (-score, doc_id). For small k a partition
        threshold replaces the full lexsort (the dominant cost on
        head-term queries — 65 ms of a 97 ms exhaustive scan at 4M
        docs): keep every row scoring >= the kth value (ties included),
        lexsort only those. Identical output to the full sort."""
        if topk is not None and 0 < topk < len(scores) // 4:
            kth = np.partition(scores, len(scores) - topk)[len(scores) - topk]
            sel = np.flatnonzero(scores >= kth)
            order = sel[np.lexsort((uids[sel], -scores[sel]))[:topk]]
        else:
            order = np.lexsort((uids, -scores))
            if topk is not None:
                order = order[:topk]
        return [(int(uids[i]), float(scores[i])) for i in order]

    def _gather_term_weights(self, p, cand: np.ndarray, coef: float, qtf_t: int) -> np.ndarray:
        """BM25 contributions of one term at the candidate docs (0 where
        the doc lacks the term), with the exact float-op order of
        ``_bm25_weights``. Lazy postings are touched at block granularity
        — blocks containing no candidate are never decoded."""
        k1, b = self.manifest.bm25_k1, self.manifest.bm25_b
        avgdl = self.manifest.avgdl or 1.0
        out = np.zeros(len(cand))
        if isinstance(p, LazyTermPostings) and p._mat is None:
            order = None
            if len(cand) > 1 and not (cand[1:] >= cand[:-1]).all():
                order = np.argsort(cand, kind="stable")  # callers pass sorted; safety net
                cand = cand[order]
            blocks = np.searchsorted(p.block_doc_max, cand, side="left")
            # cand sorted + block_doc_max sorted → blocks non-decreasing,
            # and block doc-ranges are disjoint & increasing, so the hit
            # blocks' postings concatenate into ONE globally sorted array:
            # a single searchsorted replaces the per-block Python loop
            # (untouched blocks are still never decoded)
            n_valid = int(np.searchsorted(blocks, p.n_blocks, side="left"))
            if n_valid:
                hit = np.unique(blocks[:n_valid])
                ids_cat, tfs, dls = p.decode_blocks(hit)
                sub = cand[:n_valid]
                pos = np.searchsorted(ids_cat, sub)
                pos_c = np.minimum(pos, len(ids_cat) - 1)
                ok = ids_cat[pos_c] == sub
                if ok.any():
                    w = tfs[pos_c[ok]] / (
                        tfs[pos_c[ok]] + k1 * (1.0 - b + b * dls[pos_c[ok]] / avgdl)
                    )
                    out[:n_valid][ok] = coef * w * qtf_t
            if order is not None:
                inv = np.empty_like(order)
                inv[order] = np.arange(len(order))
                out = out[inv]
        else:
            ids = p.doc_ids
            if not len(ids):
                return out
            pos = np.searchsorted(ids, cand)
            pos_c = np.minimum(pos, len(ids) - 1)
            ok = ids[pos_c] == cand
            if ok.any():
                w = p.tfs[pos_c[ok]] / (
                    p.tfs[pos_c[ok]] + k1 * (1.0 - b + b * p.dls[pos_c[ok]] / avgdl)
                )
                out[ok] = coef * w * qtf_t
        return out

    def _bm25_maxscore(self, tokens, posts, topk):
        """Exact vectorized block-max MaxScore: seed the threshold from
        the rarest term's candidates, drop terms whose cumulative upper
        bounds (from stored block maxima) cannot reach it, score only the
        essential terms' union. Returns None when every term stays
        essential (no pruning — caller falls back to exhaustive).

        Exactness: any doc outside the candidate set scores at most the
        non-essential cumulative bound, which is strictly below the
        seed-set k-th score; candidates are scored with the exhaustive
        scorer's exact float-op order, so results are bit-identical."""
        qtf: dict[str, int] = {}
        for t in tokens:
            qtf[t] = qtf.get(t, 0) + 1
        k1 = self.manifest.bm25_k1
        terms = [t for t in dict.fromkeys(tokens) if t in posts]
        coef1 = {t: (k1 + 1.0) * self.bm25_idf(posts[t].df) for t in terms}
        ub = {t: float(coef1[t] * posts[t].block_max_w.max() * qtf[t]) for t in terms}

        seed_t = min(terms, key=lambda t: posts[t].df)
        seed = self._remove_tombstones(posts[seed_t].doc_ids)
        if len(seed) < topk:
            return None
        seed_scores = np.zeros(len(seed))
        for t in terms:
            seed_scores += self._gather_term_weights(posts[t], seed, coef1[t], qtf[t])
        s_order = np.lexsort((seed, -seed_scores))
        theta = float(seed_scores[s_order[topk - 1]])

        # any subset S with Σ ub(S) < theta (strict) can be dropped: a doc
        # absent from every term outside S scores ≤ Σ ub(S) < theta
        by_ub = sorted(terms, key=lambda t: ub[t])
        cum = 0.0
        non_essential = []
        for t in by_ub:
            if t == seed_t:
                continue  # keep the seed essential so candidates ⊇ seed
            if cum + ub[t] < theta:
                cum += ub[t]
                non_essential.append(t)
            else:
                break
        if not non_essential:
            return None
        essential = [t for t in terms if t not in non_essential]
        cand = np.unique(np.concatenate([posts[t].doc_ids for t in essential]))
        cand = self._remove_tombstones(cand)
        scores = np.zeros(len(cand))
        for t in terms:
            scores += self._gather_term_weights(posts[t], cand, coef1[t], qtf[t])
        order = np.lexsort((cand, -scores))[:topk]
        return [(int(cand[i]), float(scores[i])) for i in order]

    def _bm25_wand(self, tokens, posts, topk):
        """Block-max WAND with LAZY block decode.

        Cursors navigate block metadata (``block_doc_max`` /
        ``block_max_w``); a block's postings are decoded only when the
        pivot lands in it, so skipped blocks are never decoded at all
        (north_rule: "block-max WAND pruning over a min-heap"). Scores
        are computed with the exact float-op order of the vectorized
        scorer — results are bit-identical (tests assert equality).

        Domain note: pivot stepping is per-posting Python, so WAND only
        wins when the threshold prunes aggressively (selective queries,
        small k). On dense queries with flat upper bounds it degrades
        to per-posting iteration (measured 12.8 s on a 2×340k-df query
        at 4M docs, vs 0.1 s exhaustive / 0.2 s MaxScore) — which is
        why ``method="auto"`` routes dense queries to the vectorized
        exhaustive scorer and selective ones to block-max MaxScore,
        never here; ``method="wand"`` stays available explicitly for
        the north_rule semantics and identity tests."""
        import heapq

        qtf: dict[str, int] = {}
        for t in tokens:
            qtf[t] = qtf.get(t, 0) + 1
        k1, b = self.manifest.bm25_k1, self.manifest.bm25_b
        avgdl = self.manifest.avgdl or 1.0
        terms = [t for t in dict.fromkeys(tokens) if t in posts]
        # coef chain mirrors _bm25_weights' evaluation order exactly
        coef1 = {t: (k1 + 1.0) * self.bm25_idf(posts[t].df) for t in terms}
        cur = {t: 0 for t in terms}  # global posting index per term
        n_post = {t: int(posts[t].block_bounds[-1]) for t in terms}
        ub_term = {
            t: float(coef1[t] * posts[t].block_max_w.max() * qtf[t]) for t in terms
        }
        heap: list[tuple[float, int]] = []  # min-heap of (score, -doc)
        theta = float("-inf")

        def block_of(p, idx: int) -> int:
            return int(np.searchsorted(p.block_bounds, idx, side="right") - 1)

        def doc_at(t: str, idx: int) -> int:
            p = posts[t]
            blk = block_of(p, idx)
            return int(p.block_ids(blk)[idx - int(p.block_bounds[blk])])

        def weight_at(t: str, idx: int) -> float:
            p = posts[t]
            blk = block_of(p, idx)
            k = idx - int(p.block_bounds[blk])
            tfs, dls = p.block_tf_dl(blk)
            tf = float(tfs[k])
            dl = float(dls[k])
            w = tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
            return coef1[t] * w * qtf[t]

        def block_ub(t: str, idx: int) -> float:
            p = posts[t]
            return float(coef1[t] * p.block_max_w[block_of(p, idx)] * qtf[t])

        def advance_to(t: str, target: int) -> int:
            """First posting index >= cur[t] whose doc >= target — skipping
            (and never decoding) blocks whose doc_id_max < target."""
            p = posts[t]
            blk = int(np.searchsorted(p.block_doc_max, target, side="left"))
            if blk >= len(p.block_doc_max):
                return n_post[t]
            lo = int(p.block_bounds[blk])
            ids = p.block_ids(blk)
            idx = lo + int(np.searchsorted(ids, target, side="left"))
            return max(idx, cur[t])

        while True:
            live = [t for t in terms if cur[t] < n_post[t]]
            if not live:
                break
            live.sort(key=lambda t: doc_at(t, cur[t]))
            acc = 0.0
            pivot_i = -1
            for i, t in enumerate(live):
                acc += ub_term[t]
                if acc > theta or len(heap) < topk:
                    pivot_i = i
                    break
            if pivot_i < 0:
                break
            pivot_doc = doc_at(live[pivot_i], cur[live[pivot_i]])
            first_doc = doc_at(live[0], cur[live[0]])
            if first_doc == pivot_doc:
                matching = [
                    t for t in live
                    if cur[t] < n_post[t] and doc_at(t, cur[t]) == pivot_doc
                ]
                # refine with block maxima before decoding tf/dl
                bub = sum(block_ub(t, cur[t]) for t in matching)
                score = 0.0
                if len(heap) < topk or bub > theta:
                    for t in matching:
                        score += weight_at(t, cur[t])
                if not self._is_tombstone(pivot_doc) and score > 0.0:
                    if len(heap) < topk:
                        heapq.heappush(heap, (score, -pivot_doc))
                    elif (score, -pivot_doc) > heap[0]:
                        heapq.heapreplace(heap, (score, -pivot_doc))
                    if len(heap) == topk:
                        theta = heap[0][0]
                for t in matching:
                    cur[t] += 1
            else:
                for t in live[:pivot_i]:
                    cur[t] = advance_to(t, pivot_doc)
        out = sorted(((-d, s) for s, d in heap), key=lambda x: (-x[1], x[0]))
        return [(d, s) for d, s in out]

    # ---------- deletion ----------

    def delete_by_keyword(self, keyword: str) -> int:
        """Tombstone every doc whose postings contain the analyzed keyword
        (reference ``deleteDocuments``, ``InvertedIndexManager.java:677-715``).
        Persists to the manifest; physical removal happens at compaction."""
        ids = self.search_and([keyword])
        if len(ids) == 0:
            return 0
        tomb = set(self.manifest.tombstones) | set(int(i) for i in ids)
        self.manifest.tombstones = sorted(tomb)
        self.manifest.save(self.index_dir)
        self._tombstones = np.array(self.manifest.tombstones, dtype=np.int64)
        return len(ids)

    # ---------- document fetch ----------

    def fetch_docs(self, doc_ids: np.ndarray | list[int]) -> dict[int, str]:
        """doc_id → text point lookups against the docs table (reference
        MapDB point reads, ``InvertedIndex.java:1367-1389``)."""
        ids = [int(i) for i in doc_ids]
        if not ids:
            return {}
        dset = pads.dataset(str(self.index_dir / "docs"))
        tbl = dset.to_table(filter=pc.field("doc_id").isin(ids), columns=["doc_id", "text"])
        return dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))


class QueryEngineStage:
    """Actor-pool stage for batch query workloads: the engine (shard
    caches) loads once per actor; each batch of query rows is answered
    vectorized (SURVEY.md §3.2 "Ray-native" query path)."""

    def __init__(self, index_dir: str, kind: str = "bm25", topk: int = 10):
        self.engine = SearchEngine(index_dir)
        self.kind = kind
        self.topk = topk

    def __call__(self, batch):
        import pyarrow as pa

        queries = batch["query"].to_pylist()
        qids = batch["qid"].to_pylist() if "qid" in batch.column_names else list(range(len(queries)))
        out_qid, out_rank, out_doc, out_score = [], [], [], []
        for qid, q in zip(qids, queries):
            if self.kind == "bm25":
                res = self.engine.search_bm25(q, topk=self.topk)
            elif self.kind == "tfidf":
                res = self.engine.search_tfidf(q.split(), topk=self.topk)
            elif self.kind == "and":
                res = [(int(d), 1.0) for d in self.engine.search_and(q.split())]
            elif self.kind == "or":
                res = [(int(d), 1.0) for d in self.engine.search_or(q.split())]
            elif self.kind == "phrase":
                res = [(int(d), 1.0) for d in self.engine.search_phrase(q)]
            else:
                raise ValueError(self.kind)
            for rank, (doc, score) in enumerate(res):
                out_qid.append(qid)
                out_rank.append(rank)
                out_doc.append(doc)
                out_score.append(score)
        import pyarrow as pa

        return pa.table(
            {
                "qid": pa.array(out_qid),
                "rank": pa.array(out_rank, pa.int32()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "score": pa.array(out_score, pa.float64()),
            }
        )
