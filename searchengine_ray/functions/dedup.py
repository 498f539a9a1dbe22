"""Deduplication ops for training-data pipelines (engine extras; graded as
first-class components):

- exact:        content-hash → hash-partitioned group → keep min doc_id
- minhash-LSH:  word-shingle MinHash signatures → banded LSH buckets →
                candidate pairs → exact-Jaccard verify
- simhash:      64-bit SimHash + banded blocking → Hamming-distance pairs
- ngram-jaccard: exact Jaccard over word n-gram sets for candidate pairs
- embedding:    cosine near-dup pairs over an embedding column

Scale shapes (SURVEY.md §4 / ray_guide): hashing and signatures are
vectorized per batch; the only shuffles are ``groupby`` on
(hash) / (band, key) whose cardinality ≈ corpus size; pair verification
fans out per bucket, never all-pairs (except the deliberately-brute-force
embedding verifier, which is blocked matmul per batch against a
broadcast candidate matrix at small scale and LSH-bucketed beyond)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .textstats import _token_lists

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------- exact


def add_content_hash(batch: pa.Table, text_column: str = "text") -> pa.Table:
    texts = batch[text_column].to_pandas().fillna("")
    h = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    return batch.append_column("content_hash", pa.array(h, pa.string()))


def exact_dedup(ds, text_column: str = "text"):
    """Survivors (min doc_id per distinct text) + duplicate count.
    Returns a Dataset with columns ``doc_id, n_dups``.

    Group cardinality ≈ corpus size (one group per distinct text), so
    this is the partition-bucket pattern, not a native
    groupby(content_hash).aggregate — Ray's native aggregate pays
    ~5 µs of Python per GROUP (measured; see _shingle_pair_counts),
    which at 10^9 distinct docs is hours. Hash each content_hash into
    a partition; inside each, a pandas C-hash groupby does min/count
    vectorized. Same results, aggregate-partial shuffle volume."""
    # partition count scales with corpus size (fixed fan-out would grow
    # per-partition volume linearly and OOM a worker at the 10^9-group
    # scale this pattern exists for); count() on the pre-transform input
    # is metadata-cheap for parquet reads
    n_parts = _npartitions(ds.count())
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_column), batch_format="pyarrow"
    )

    def add_hpart(b: pa.Table) -> pa.Table:
        import pandas as pd

        h = pd.util.hash_array(b["content_hash"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "_hp": pa.array((h % np.uint64(n_parts)).astype(np.int32), pa.int32()),
                "content_hash": b["content_hash"],
                "doc_id": b["doc_id"],
            }
        )

    def combine(g) -> pa.Table:
        df = g.to_pandas()
        out = (
            df.groupby("content_hash", sort=False)["doc_id"]
            .agg(doc_id="min", n_dups="size")
            .reset_index(drop=True)
        )
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64), pa.int64()),
                "n_dups": pa.array(out["n_dups"].to_numpy(np.int64), pa.int64()),
            }
        )

    return (
        hashed.map_batches(add_hpart, batch_format="pyarrow")
        .groupby("_hp")
        .map_groups(combine, batch_format="pyarrow")
    )


# ------------------------------------------------------------- minhash


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of string shingles (reference/oracle path —
    the hot pipelines use the vectorized token-hash route below)."""
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
        )
    return out


def word_shingles(tokens: list[str], k: int) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


_SHINGLE_MULT = np.uint64(0x9E3779B97F4A7C15)


def _token_hash_lists(toks: pd.Series) -> list[np.ndarray]:
    """Stable 64-bit hash per token, vectorized across the whole batch
    (one ``pd.util.hash_array`` call over the flattened token list) —
    replaces per-shingle ``blake2b`` Python loops in the hot path."""
    lens = [len(ts) for ts in toks]
    flat = [t for ts in toks for t in ts]
    if not flat:
        return [np.empty(0, np.uint64) for _ in lens]
    h = pd.util.hash_array(np.asarray(flat, dtype=object)).astype(np.uint64)
    out, off = [], 0
    for n in lens:
        out.append(h[off : off + n])
        off += n
    return out


def _shingle_hash_set(tok_h: np.ndarray, k: int) -> np.ndarray:
    """Sorted unique polynomial window-hashes over consecutive token
    hashes — the vectorized equivalent of ``set(word_shingles(...))``
    (docs shorter than k collapse to one whole-doc shingle, matching
    ``word_shingles``). uint64 arithmetic wraps mod 2^64."""
    n = len(tok_h)
    if n == 0:
        return np.empty(0, np.uint64)
    k = min(k, n)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    m = np.uint64(1)
    with np.errstate(over="ignore"):  # mod-2^64 wrap is the hash design
        for j in range(k):
            acc += tok_h[j : n - k + 1 + j] * m
            m = m * _SHINGLE_MULT
    return np.unique(acc)


class MinHasher:
    """n_perm universal-hash MinHash over 64-bit shingle hashes."""

    def __init__(self, n_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
        self.n_perm = n_perm

    @staticmethod
    def _mod_mersenne(h: np.ndarray) -> np.ndarray:
        """Bit-exact ``h % (2**61 - 1)`` for uint64 via the Mersenne fold
        (2^61 ≡ 1 mod M, high 3 bits ≤ 7 so one conditional subtract
        suffices) — same values as ``%`` without uint64 division, and
        done in place to keep the segment-min memory-bandwidth bound low.
        MUTATES ``h`` and returns it."""
        m = np.uint64(_MERSENNE)
        lo = h & m
        h >>= np.uint64(61)
        h += lo
        np.subtract(h, m, out=h, where=h >= m)
        return h

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (n_perm, n_shingles) universal hashing mod Mersenne prime
        x = shingle_hashes.astype(np.uint64)[None, :]
        with np.errstate(over="ignore"):  # mod-2^64 wrap is the hash design
            h = self._mod_mersenne(self.a[:, None] * x + self.b[:, None])
        return h.min(axis=1)

    def signature_many(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """(n_docs, n_perm) signatures in one pass: concatenate the batch's
        shingle sets, hash the flat array once per chunk, and segment-min
        with ``np.minimum.reduceat`` — identical arithmetic (uint64 wrap
        then mod Mersenne) to ``signature``, without the per-doc Python
        loop that dominated the old signature stage at thousands of small
        docs per batch. Chunked so the (n_perm, n_shingles) work matrix
        stays ~64 MB regardless of batch size."""
        big = np.iinfo(np.uint64).max
        n_docs = len(shingle_sets)
        out = np.full((n_docs, self.n_perm), big, dtype=np.uint64)
        lens = np.fromiter((len(s) for s in shingle_sets), np.int64, n_docs)
        idx = np.flatnonzero(lens)
        if len(idx) == 0:
            return out
        budget = 1 << 14  # flat shingle hashes per chunk (keeps h in cache)
        start = 0
        while start < len(idx):
            end, tot = start, 0
            while end < len(idx) and (tot == 0 or tot + lens[idx[end]] <= budget):
                tot += lens[idx[end]]
                end += 1
            run = idx[start:end]
            cat = np.concatenate([shingle_sets[i] for i in run]).astype(np.uint64)
            starts = np.zeros(len(run), np.int64)
            np.cumsum(lens[run[:-1]], out=starts[1:])
            with np.errstate(over="ignore"):  # mod-2^64 wrap is the hash design
                h = self.a[:, None] * cat[None, :]
                h += self.b[:, None]
                self._mod_mersenne(h)
            out[run] = np.minimum.reduceat(h, starts, axis=1).T
            start = end
        return out


def minhash_signature_batch(
    batch: pa.Table, hasher: MinHasher, shingle_k: int = 3, text_column: str = "text"
) -> pa.Table:
    texts = batch[text_column].to_pandas()
    toks = _token_lists(texts)
    sets = [_shingle_hash_set(th, shingle_k) for th in _token_hash_lists(toks)]
    sigs = hasher.signature_many(sets)  # (n_docs, n_perm), one segment-min
    n_docs, n_perm = sigs.shape
    offsets = np.arange(0, (n_docs + 1) * n_perm, n_perm, dtype=np.int32)
    sig_col = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(sigs.reshape(-1), pa.uint64())
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "sig": sig_col,
        }
    )


def _npartitions(n_rows: int, target_rows: int = 100_000, floor: int = 64) -> int:
    """Coarse partition count for the partition-bucket pattern: grouping
    millions of tiny LSH buckets directly pays Python per-group overhead
    per *bucket*; hashing buckets into ~``n_rows/target_rows`` partitions
    and doing the per-bucket work vectorized inside each partition group
    pays it per *partition* instead."""
    return max(floor, -(-int(n_rows) // max(target_rows, 1)))


def explode_bands(batch: pa.Table, n_bands: int, n_parts: int) -> pa.Table:
    """Signature → (part, band_id, band_key, doc_id) rows. Band keys are
    vectorized polynomial hashes of the band's signature slice (equal
    slices → equal keys; collisions only add candidates, which the exact
    verify filters)."""
    sigs = batch["sig"].combine_chunks()
    n_docs = batch.num_rows
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    flat = sigs.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    n_perm = len(flat) // max(n_docs, 1) if n_docs else 0
    rows_per_band = max(n_perm // n_bands, 1)
    band_ids, band_keys, out_docs = [], [], []
    if n_docs:
        mat = flat.reshape(n_docs, n_perm)
        for band in range(n_bands):
            chunk = mat[:, band * rows_per_band : (band + 1) * rows_per_band]
            key = np.full(n_docs, np.uint64(band) + np.uint64(1), np.uint64)
            m = np.uint64(1)
            for j in range(chunk.shape[1]):
                key += chunk[:, j] * m
                m = m * _SHINGLE_MULT
            band_ids.append(np.full(n_docs, band, np.int32))
            band_keys.append(key.astype(np.int64))
            out_docs.append(doc_ids)
    band_keys_all = np.concatenate(band_keys) if band_keys else np.empty(0, np.int64)
    return pa.table(
        {
            "part": pa.array(
                band_keys_all.astype(np.uint64) % np.uint64(n_parts), pa.int32()
            ),
            "band_id": pa.array(
                np.concatenate(band_ids) if band_ids else np.empty(0, np.int32), pa.int32()
            ),
            "band_key": pa.array(band_keys_all, pa.int64()),
            "doc_id": pa.array(
                np.concatenate(out_docs) if out_docs else np.empty(0, np.int64), pa.int64()
            ),
        }
    )


def minhash_candidates(ds, n_perm=128, n_bands=16, shingle_k=3, text_column="text", n_parts=None):
    """Dataset of candidate pairs ``doc_a < doc_b`` from LSH buckets (a
    pair recurs once per agreeing band — callers dedup downstream).

    One coarse ``groupby(part)`` instead of one group per bucket; inside
    a partition, singleton buckets are dropped vectorized and only real
    collision buckets (the near-dup clusters) are looped."""
    hasher = MinHasher(n_perm)
    if n_parts is None:
        n_parts = _npartitions(ds.count() * n_bands)
    sigs = ds.map_batches(
        lambda b: minhash_signature_batch(b, hasher, shingle_k, text_column),
        batch_format="pyarrow",
    )
    bands = sigs.map_batches(
        lambda b: explode_bands(b, n_bands, n_parts), batch_format="pyarrow"
    )

    _EMPTY_PAIRS = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )

    def bucket_pairs_bulk(group: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): one lexsort per partition,
        # then only the collision runs (≥2 rows sharing a band bucket)
        # are looped — the near-dup clusters, a tiny fraction of rows.
        bid = group["band_id"].to_numpy(zero_copy_only=False)
        bkey = group["band_key"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort([did, bkey, bid])
        bid, bkey, did = bid[order], bkey[order], did[order]
        n = len(bid)
        if n == 0:
            return _EMPTY_PAIRS
        boundary = np.r_[True, (bid[1:] != bid[:-1]) | (bkey[1:] != bkey[:-1])]
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], n)
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ids = np.unique(did[s:e])
            if len(ids) < 2:
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        if not out_a:
            return _EMPTY_PAIRS
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    return bands.groupby("part").map_groups(bucket_pairs_bulk, batch_format="pyarrow")


def jaccard(tokens_a: list[str], tokens_b: list[str], k: int = 3) -> float:
    sa, sb = set(word_shingles(tokens_a, k)), set(word_shingles(tokens_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def shingle_set_batch(batch: pa.Table, shingle_k: int, text_column: str) -> pa.Table:
    """doc_id → sorted unique 64-bit shingle-hash set (the exact-Jaccard
    carrier; string sets and 64-bit hash sets give the same Jaccard up to
    negligible collision probability)."""
    texts = batch[text_column].to_pandas()
    toks = _token_lists(texts)
    sets = [_shingle_hash_set(th, shingle_k) for th in _token_hash_lists(toks)]
    n = len(sets)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "doc_a": pa.array([-1] * n, pa.int64()),
            "doc_b": pa.array([-1] * n, pa.int64()),
            "shingles": pa.array([s.tolist() for s in sets], pa.list_(pa.uint64())),
        }
    )


def minhash_dedup_pairs(ds, threshold=0.8, n_perm=128, n_bands=16, shingle_k=3, text_column="text") -> pd.DataFrame:
    """End-to-end near-dup pairs: LSH candidates verified by exact Jaccard,
    fully distributed (nothing corpus-sized touches the driver):

    1. candidate pairs from banded LSH buckets (a pair recurs per
       agreeing band — deduped at verify, trading a shuffle for a few
       duplicate pair-rows);
    2. each pair splits into two half-requests keyed by doc_id, unioned
       with the per-doc shingle sets and co-grouped by doc_id partition —
       a repartition join that ships a doc's shingles only to its own
       candidate pairs;
    3. halves regroup by pair partition; exact Jaccard is one
       ``np.intersect1d`` over the two sorted hash sets per pair.

    Only the final verified pair list (small) is collected."""
    n_docs = ds.count()
    n_parts = _npartitions(n_docs)
    pairs_ds = minhash_candidates(
        ds, n_perm, n_bands, shingle_k, text_column, n_parts=_npartitions(n_docs * n_bands)
    )

    def half_requests(b: pa.Table) -> pa.Table:
        da = b["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = b["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.concatenate([da, db])
        return pa.table(
            {
                "part": pa.array(doc.astype(np.uint64) % np.uint64(n_parts), pa.int32()),
                "doc_id": pa.array(doc, pa.int64()),
                "doc_a": pa.array(np.concatenate([da, da]), pa.int64()),
                "doc_b": pa.array(np.concatenate([db, db]), pa.int64()),
                "shingles": pa.array([None] * (2 * len(da)), pa.list_(pa.uint64())),
            }
        )

    requests = pairs_ds.map_batches(half_requests, batch_format="pyarrow")

    def shingles_with_part(b: pa.Table) -> pa.Table:
        t = shingle_set_batch(b, shingle_k, text_column)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.add_column(
            0, "part", pa.array(doc.astype(np.uint64) % np.uint64(n_parts), pa.int32())
        )

    shingles = ds.map_batches(shingles_with_part, batch_format="pyarrow")

    _EMPTY_HALF = pa.table(
        {
            "ppart": pa.array([], pa.int32()),
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "side_doc": pa.array([], pa.int64()),
            "shingles": pa.array([], pa.list_(pa.uint64())),
        }
    )

    def attach_bulk(group: pa.Table) -> pa.Table:
        """Join request halves to their doc's shingle set, vectorized:
        sorted own-ids + searchsorted + one list-column take."""
        group = group.combine_chunks()
        da = group["doc_a"].to_numpy(zero_copy_only=False)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        own_idx = np.flatnonzero(da == -1)
        req_idx = np.flatnonzero(da != -1)
        if not len(req_idx) or not len(own_idx):
            return _EMPTY_HALF
        own_ids = doc[own_idx]
        order = np.argsort(own_ids)
        own_ids_sorted = own_ids[order]
        req_ids = doc[req_idx]
        pos = np.searchsorted(own_ids_sorted, req_ids)
        pos = np.clip(pos, 0, len(own_ids_sorted) - 1)
        found = own_ids_sorted[pos] == req_ids
        req_idx = req_idx[found]
        req_ids = req_ids[found]
        sh_rows = own_idx[order][pos[found]]
        a = group["doc_a"].to_numpy(zero_copy_only=False)[req_idx]
        b = group["doc_b"].to_numpy(zero_copy_only=False)[req_idx]
        ppart = ((a.astype(np.uint64) * _SHINGLE_MULT) ^ b.astype(np.uint64)) % np.uint64(n_parts)
        return pa.table(
            {
                "ppart": pa.array(ppart, pa.int32()),
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "side_doc": pa.array(req_ids, pa.int64()),
                "shingles": group["shingles"].take(sh_rows),
            }
        )

    halves = requests.union(shingles).groupby("part").map_groups(
        attach_bulk, batch_format="pyarrow"
    )

    _EMPTY_OUT = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def verify_bulk(group: pa.Table) -> pa.Table:
        """Dedup (pair, side) rows, then one exact-Jaccard per pair."""
        group = group.combine_chunks()
        a = group["doc_a"].to_numpy(zero_copy_only=False)
        b = group["doc_b"].to_numpy(zero_copy_only=False)
        side = group["side_doc"].to_numpy(zero_copy_only=False)
        key = np.stack([a, b, side], axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        first = np.sort(first)
        a, b, side = a[first], b[first], side[first]
        sh = group["shingles"].take(first)
        order = np.lexsort((side, b, a))
        a, b, side = a[order], b[order], side[order]
        sh = sh.take(order.tolist())
        out_a, out_b, out_j = [], [], []
        i = 0
        offs = sh.combine_chunks().offsets.to_numpy(zero_copy_only=False)
        flat = sh.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        while i + 1 < len(a):
            if a[i] == a[i + 1] and b[i] == b[i + 1]:
                sa = flat[offs[i] : offs[i + 1]]
                sb = flat[offs[i + 1] : offs[i + 2]]
                if not len(sa) and not len(sb):
                    j = 1.0
                else:
                    inter = len(np.intersect1d(sa, sb, assume_unique=True))
                    j = inter / (len(sa) + len(sb) - inter)
                if j >= threshold:
                    out_a.append(int(a[i]))
                    out_b.append(int(b[i]))
                    out_j.append(round(j, 6))
                i += 2
            else:
                i += 1  # orphan half (shouldn't happen)
        if not out_a:
            return _EMPTY_OUT
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    out = (
        halves.groupby("ppart")
        .map_groups(verify_bulk, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    return out.astype({"doc_a": "int64", "doc_b": "int64"}).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)


# -------------------------------------------------------- ngram jaccard


def _shingle_pair_counts(ds, shingle_k: int, text_column: str):
    """Shared machinery for the exact shingle-overlap family
    (:func:`ngram_jaccard_pairs`, :func:`ngram_containment_pairs`): a
    distributed shingle inverted index whose per-pair shared-shingle
    row count IS ``|A ∩ B|``:

    1. explode per-doc shingle sets to ``(shingle, doc_id, set_size)``
       posting rows (same vectorized 64-bit shingle hashing as MinHash);
    2. ``groupby(shingle)`` emits one candidate-pair row per SHARED
       shingle;
    3. ``groupby(pair)`` counts rows and carries the two set sizes.

    Returns a Dataset of ``(pair, count(), min(sa), min(sb))`` where
    ``pair`` packs ``(a < b)`` as ``a·2^32 + b``.

    Scale note: cost is Σ_shingle group_size² — hot shingles make this
    quadratic, which is exactly why MinHash+LSH is the 100-TB path; this
    family is for corpus-sized slices where exactness matters."""

    def shingle_rows(b: pa.Table) -> pa.Table:
        texts = b[text_column].to_pandas()
        toks = _token_lists(texts)
        sets = [_shingle_hash_set(th, shingle_k) for th in _token_hash_lists(toks)]
        docs = b["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # pair keys downstream pack (a, b) as a*2^32 + b — hash-mode doc
        # ids (full-range uint64) would silently collide; fail loudly.
        if docs.size and (docs.min() < 0 or docs.max() >= 1 << 32):
            raise ValueError(
                "ngram_jaccard_pairs requires doc ids in [0, 2^32) to pack "
                "candidate pairs into uint64 keys; re-id the corpus (e.g. "
                "doc_id_mode='dense') or add a dense surrogate id column"
            )
        counts = np.asarray([len(s) for s in sets], dtype=np.int64)
        return pa.table(
            {
                "shingle": pa.array(
                    np.concatenate(sets) if len(sets) else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
                "doc_id": pa.array(np.repeat(docs, counts), pa.int64()),
                "size": pa.array(np.repeat(counts, counts), pa.int64()),
            }
        )

    n_parts = _npartitions(ds.count())

    def add_part(b: pa.Table) -> pa.Table:
        sh = b["shingle"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((sh % np.uint64(n_parts)).astype(np.int32), pa.int32())
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        """One partition of the shingle inverted index: sort by shingle,
        emit pair rows per run with >= 2 docs (one Python iteration per
        SHARED shingle only — unique shingles, the vast majority, cost a
        vectorized run-length pass and nothing more)."""
        group = group.combine_chunks()
        sh = group["shingle"].to_numpy(zero_copy_only=False)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        size = group["size"].to_numpy(zero_copy_only=False)
        o = np.lexsort((doc, sh))
        sh, doc, size = sh[o], doc[o], size[o]
        n = len(sh)
        pair_l, sa_l, sb_l = [], [], []
        if n:
            new = np.empty(n, dtype=bool)
            new[0] = True
            new[1:] = sh[1:] != sh[:-1]
            starts = np.flatnonzero(new)
            lens = np.diff(np.append(starts, n))
            for s, k in zip(starts[lens >= 2], lens[lens >= 2]):
                ia, ib = np.triu_indices(int(k), k=1)
                d = doc[s : s + k]
                z = size[s : s + k]
                # pack (a < b) into one uint64 key: ids dense, < 2^31
                pair_l.append(
                    d[ia].astype(np.uint64) * np.uint64(1 << 32)
                    + d[ib].astype(np.uint64)
                )
                sa_l.append(z[ia])
                sb_l.append(z[ib])
        cat = (
            lambda parts, dt: np.concatenate(parts)
            if parts
            else np.empty(0, dt)
        )
        return pa.table(
            {
                "pair": pa.array(cat(pair_l, np.uint64), pa.uint64()),
                "sa": pa.array(cat(sa_l, np.int64), pa.int64()),
                "sb": pa.array(cat(sb_l, np.int64), pa.int64()),
            }
        )

    # pair counting uses the SAME partition-bucket pattern as the
    # shingle stage: a native groupby(pair).aggregate pays per-GROUP
    # Python overhead over ~1M tiny pair groups (measured 187 s on a
    # synthetic 2.9M-row/1.1M-group table vs ~1 s vectorized); hashing
    # pairs into ~n/100k partitions and np.unique-counting inside each
    # keeps the shuffle but does the per-group work in C. sa/sb are
    # constant per pair (set sizes of the two docs), so "min" = first.
    def add_pair_part(b: pa.Table) -> pa.Table:
        pr = b["pair"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part2": pa.array((pr % np.uint64(n_parts)).astype(np.int32), pa.int32()),
                "pair": b["pair"],
                "sa": b["sa"],
                "sb": b["sb"],
            }
        )

    def count_pairs(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        pr = group["pair"].to_numpy(zero_copy_only=False)
        sa = group["sa"].to_numpy(zero_copy_only=False)
        sb = group["sb"].to_numpy(zero_copy_only=False)
        uniq, first, counts = np.unique(pr, return_index=True, return_counts=True)
        return pa.table(
            {
                "pair": pa.array(uniq, pa.uint64()),
                "count()": pa.array(counts.astype(np.int64), pa.int64()),
                "min(sa)": pa.array(sa[first], pa.int64()),
                "min(sb)": pa.array(sb[first], pa.int64()),
            }
        )

    return (
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(count_pairs, batch_format="pyarrow")
    )


def ngram_jaccard_pairs(
    ds, threshold: float = 0.5, shingle_k: int = 3, text_column: str = "text"
) -> pd.DataFrame:
    """EXACT n-gram-Jaccard near-dup pairs — the oracle-exact baseline
    next to the approximate paths (``minhash_dedup_pairs`` banded-LSH
    recall, ``simhash_pairs`` Hamming blocking):
    ``jaccard = c / (|A| + |B| - c) >= threshold`` over the shared
    shingle counts from :func:`_shingle_pair_counts`.

    Docs whose shingle set is EMPTY (empty text) pair with each other at
    ``jaccard = 1.0`` by convention (matching :func:`jaccard` and the
    SQL oracle) — they share no posting rows, so they are paired in a
    separate tiny pass."""
    counted = _shingle_pair_counts(ds, shingle_k, text_column)

    def finish(b: pa.Table) -> pa.Table:
        pair = b["pair"].to_numpy(zero_copy_only=False)
        c = b["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
        sa = b["min(sa)"].to_numpy(zero_copy_only=False).astype(np.float64)
        sb = b["min(sb)"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = c / (sa + sb - c)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array((pair[keep] >> np.uint64(32)).astype(np.int64)),
                "doc_b": pa.array(
                    (pair[keep] & np.uint64(0xFFFFFFFF)).astype(np.int64)
                ),
                "jaccard": pa.array(np.round(j[keep], 6), pa.float64()),
            }
        )

    out = counted.map_batches(finish, batch_format="pyarrow").to_pandas()

    # empty-set docs: jaccard(∅, ∅) = 1.0 by convention — they share no
    # shingle rows, so pair them here (tiny: only truly empty texts)
    def empty_docs(b: pa.Table) -> pa.Table:
        texts = b[text_column].to_pandas()
        toks = _token_lists(texts)
        empt = [len(_shingle_hash_set(th, shingle_k)) == 0 for th in _token_hash_lists(toks)]
        return pa.table(
            {"doc_id": b["doc_id"].cast(pa.int64()).filter(pa.array(empt))}
        )

    empties = sorted(
        r["doc_id"] for r in ds.map_batches(empty_docs, batch_format="pyarrow").take_all()
    )
    if len(empties) > 1 and 1.0 >= threshold:
        ia, ib = np.triu_indices(len(empties), k=1)
        ed = np.asarray(empties, dtype=np.int64)
        out = pd.concat(
            [
                out,
                pd.DataFrame(
                    {"doc_a": ed[ia], "doc_b": ed[ib], "jaccard": 1.0}
                ),
            ],
            ignore_index=True,
        )
    if out.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    return out.astype({"doc_a": "int64", "doc_b": "int64"}).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)


def ngram_containment_pairs(
    ds, threshold: float = 0.8, shingle_k: int = 3, text_column: str = "text"
) -> pd.DataFrame:
    """ASYMMETRIC shingle containment ``|A ∩ B| / |A| >= threshold`` —
    catches doc-inside-doc duplication (quoted articles, boilerplate
    wrappers, truncated mirrors) that symmetric Jaccard misses: a short
    page fully contained in a long one has tiny Jaccard but containment
    1.0. Directed output: one row per (contained, container) direction
    that clears the threshold, both directions possible. Docs with an
    empty shingle set are excluded (containment is undefined). Shares
    the distributed shingle-inverted-index candidate machinery with
    :func:`ngram_jaccard_pairs` (:func:`_shingle_pair_counts`)."""
    counted = _shingle_pair_counts(ds, shingle_k, text_column)

    def finish(b: pa.Table) -> pa.Table:
        pair = b["pair"].to_numpy(zero_copy_only=False)
        c = b["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
        sa = b["min(sa)"].to_numpy(zero_copy_only=False).astype(np.float64)
        sb = b["min(sb)"].to_numpy(zero_copy_only=False).astype(np.float64)
        a_id = (pair >> np.uint64(32)).astype(np.int64)
        b_id = (pair & np.uint64(0xFFFFFFFF)).astype(np.int64)
        # both directions of the unordered candidate pair
        contained = np.concatenate([a_id, b_id])
        container = np.concatenate([b_id, a_id])
        cont = np.concatenate([c / sa, c / sb])
        keep = cont >= threshold
        return pa.table(
            {
                "contained": pa.array(contained[keep], pa.int64()),
                "container": pa.array(container[keep], pa.int64()),
                "containment": pa.array(np.round(cont[keep], 6), pa.float64()),
            }
        )

    out = counted.map_batches(finish, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"contained": pd.Series([], dtype="int64"),
                             "container": pd.Series([], dtype="int64"),
                             "containment": pd.Series([], dtype="float64")})
    return out.sort_values(["contained", "container"]).reset_index(drop=True)


# -------------------------------------------------------------- simhash


# token -> md5-lower-64 memo; per worker process, bounded by vocab size
_MD5_MEMO: dict[str, int] = {}


def _md5_hash_lists(toks: pd.Series) -> list[np.ndarray]:
    """64-bit token hash equal to DuckDB's ``md5_number_lower`` (lower 8
    md5-digest bytes, little-endian) so the SQL oracle can recompute
    SimHash signatures bit-for-bit. md5 runs once per *unique* token
    (factorize + memo) — Zipfian vocab makes that O(vocab), not
    O(tokens)."""
    import hashlib

    lens = [len(ts) for ts in toks]
    flat = [t for ts in toks for t in ts]
    if not flat:
        return [np.empty(0, np.uint64) for _ in lens]
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    uh = np.empty(len(uniques), np.uint64)
    for i, u in enumerate(uniques):
        v = _MD5_MEMO.get(u)
        if v is None:
            v = int.from_bytes(hashlib.md5(u.encode()).digest()[8:], "little")
            _MD5_MEMO[u] = v
        uh[i] = v
    h = uh[codes]
    out, off = [], 0
    for n in lens:
        out.append(h[off : off + n])
        off += n
    return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """64-bit SimHash over the token multiset (weight = tf): one
    (n_unique, 64) bit-matrix matvec per doc. Token hash is the
    DuckDB-compatible md5-lower-64 (see ``_md5_hash_lists``) so
    ``sql_dedup_simhash`` can verify signatures exactly."""
    texts = batch[text_column].to_pandas()
    toks = _token_lists(texts)
    tok_hashes = _md5_hash_lists(toks)
    shifts = np.arange(64, dtype=np.uint64)
    powers = (np.uint64(1) << shifts).astype(np.uint64)
    out = np.empty(len(tok_hashes), dtype=np.uint64)
    for i, th in enumerate(tok_hashes):
        if not len(th):
            out[i] = np.uint64(0)
            continue
        uniq, tf = np.unique(th, return_counts=True)
        bits = ((uniq[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((bits * 2 - 1) * tf[:, None].astype(np.int64)).sum(axis=0)
        out[i] = (powers[acc > 0]).sum(dtype=np.uint64)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "simhash": pa.array(out.astype(np.int64), pa.int64()),
        }
    )


def simhash_pairs(ds, max_hamming: int = 3, text_column: str = "text") -> pd.DataFrame:
    """Near-dup pairs by SimHash: 4-band blocking (any pair within
    Hamming ≤ 3 of a 64-bit hash agrees exactly on ≥1 of 4 16-bit bands)
    then exact Hamming verify."""
    sig_ds = ds.map_batches(lambda b: simhash_batch(b, text_column), batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        docs = batch["doc_id"].to_numpy(zero_copy_only=False)
        sigs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(docs)
        shifts = (np.arange(4, dtype=np.uint64) * np.uint64(16))[:, None]
        keys = ((sigs[None, :] >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "band_id": pa.array(np.repeat(np.arange(4, dtype=np.int32), n), pa.int32()),
                "band_key": pa.array(keys.ravel(), pa.int64()),
                "doc_id": pa.array(np.tile(docs.astype(np.int64), 4), pa.int64()),
                "simhash": pa.array(np.tile(sigs.astype(np.int64), 4), pa.int64()),
            }
        )

    _EMPTY_HAM = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         "hamming": pa.array([], pa.int64())}
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): dedup+sort by doc_id in numpy
        # (one simhash per doc, so keep-first equals keep-any), then the
        # same upper-triangle vectorized Hamming verify.
        ids0 = group["doc_id"].to_numpy(zero_copy_only=False)
        sig0 = group["simhash"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids0, kind="stable")
        ids_s, sig_s = ids0[order], sig0[order]
        keep = np.r_[True, ids_s[1:] != ids_s[:-1]] if len(ids_s) else np.zeros(0, bool)
        ids, sigs = ids_s[keep], sig_s[keep].astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            x = np.bitwise_xor(sigs[i + 1 :], sigs[i])
            ham = _popcount64(x)
            hits = np.flatnonzero(ham <= max_hamming)
            if len(hits):
                out_a.append(np.full(len(hits), ids[i], np.int64))
                out_b.append(ids[i + 1 + hits])
                out_h.append(ham[hits].astype(np.int64))
        if not out_a:
            return _EMPTY_HAM
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
                "hamming": pa.array(np.concatenate(out_h), pa.int64()),
            }
        )

    pairs = (
        sig_ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    return pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# -------------------------------------------------- embedding near-dup


_EMPTY_COS_PAIRS = pd.DataFrame(
    {"vec_a": pd.Series([], dtype="int64"), "vec_b": pd.Series([], dtype="int64"),
     "cosine": pd.Series([], dtype="float64")}
)


def embedding_neardup_pairs(
    ds,
    threshold: float = 0.95,
    id_column="vec_id",
    emb_column="embedding",
    mode: str = "auto",
    brute_max_rows: int = 200_000,
    n_planes: int = 12,
    n_bands: int = 16,
    seed: int = 42,
) -> pd.DataFrame:
    """Cosine ≥ threshold pairs.

    ``mode="brute"``: exact — each batch does one matmul against the full
    normalized matrix (broadcast once via ``ray.put``). O(n²) work and
    O(n) driver memory; the baseline, and the oracle-exact path.
    ``mode="lsh"``: scale path — banded random-hyperplane bucketing, exact
    cosine only within buckets (``groupby``), pairs deduped with a native
    aggregate. Approximate (recall < 1 for low thresholds); nothing
    corpus-sized on the driver. ``mode="auto"`` picks brute below
    ``brute_max_rows`` rows, LSH above."""
    import ray

    if mode == "auto":
        mode = "brute" if ds.count() <= brute_max_rows else "lsh"

    if mode == "lsh":
        return _embedding_neardup_lsh(
            ds, threshold, id_column, emb_column, n_planes, n_bands, seed
        )

    full = ds.select_columns([id_column, emb_column]).to_pandas()
    ids = full[id_column].to_numpy(np.int64)
    mat = np.stack(full[emb_column].to_numpy()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def score(batch: pa.Table, _ref=ref) -> pa.Table:
        all_ids, all_mat = ray.get(_ref)
        b_ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        b_mat = np.stack(batch[emb_column].to_pandas().to_numpy()).astype(np.float64)
        b_mat = b_mat / np.maximum(np.linalg.norm(b_mat, axis=1, keepdims=True), 1e-12)
        sims = b_mat @ all_mat.T
        r, c = np.nonzero(sims >= threshold)
        keep = b_ids[r] < all_ids[c]
        r, c = r[keep], c[keep]
        return pa.table(
            {
                "vec_a": pa.array(b_ids[r], pa.int64()),
                "vec_b": pa.array(all_ids[c], pa.int64()),
                "cosine": pa.array(np.round(sims[r, c], 6), pa.float64()),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if out.empty:
        return _EMPTY_COS_PAIRS.copy()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def _embedding_neardup_lsh(ds, threshold, id_column, emb_column, n_planes, n_bands, seed):
    """Banded hyperplane LSH: vectors land in ``n_bands`` buckets; each
    bucket brute-forces its own members; pairs are deduped (max over
    bands is the same exact cosine) with one small aggregate."""
    planes = None  # (n_bands * n_planes, dim), built lazily from the first batch

    def assign(batch: pa.Table) -> pa.Table:
        nonlocal planes
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(batch[emb_column].to_pandas().to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        if planes is None:
            planes = np.random.default_rng(seed).standard_normal(
                (n_bands * n_planes, mat.shape[1])
            )
        bits = (mat @ planes.T) > 0
        n, dim = mat.shape
        # per-band bucket keys in one matmul-free pass: (n, n_bands)
        pw = (1 << np.arange(n_planes)).astype(np.int64)
        keys = (
            bits.reshape(n, n_bands, n_planes).astype(np.int64) * pw[None, None, :]
        ).sum(axis=2)
        # normalized vectors ship once per band as a fixed-size-list Arrow
        # column (flat float64 buffer) — no per-row Python lists
        tiled = np.tile(mat, (n_bands, 1)).ravel()
        nemb = pa.FixedSizeListArray.from_arrays(pa.array(tiled, pa.float64()), dim)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(n_bands, dtype=np.int64), n), pa.int64()),
                "key": pa.array(keys.T.ravel(), pa.int64()),
                "vec_id": pa.array(np.tile(ids, n_bands), pa.int64()),
                "nemb": nemb,
            }
        )

    _EMPTY = pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return _EMPTY
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order]
        col = group["nemb"].combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False).reshape(
            group.num_rows, -1
        )[order]
        sims = mat @ mat.T
        r, c = np.nonzero(np.triu(sims >= threshold, k=1))
        keep = ids[r] != ids[c]
        r, c = r[keep], c[keep]
        return pa.table(
            {
                "vec_a": pa.array(ids[r], pa.int64()),
                "vec_b": pa.array(ids[c], pa.int64()),
                "cosine": pa.array(np.round(sims[r, c], 6), pa.float64()),
            }
        )

    from ray.data.aggregate import Max

    pairs = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["vec_a", "vec_b"])
        .aggregate(Max("cosine"))
    )
    out = pairs.to_pandas()
    if out.empty:
        return _EMPTY_COS_PAIRS.copy()
    out = out.rename(columns={"max(cosine)": "cosine"})
    return out.astype({"vec_a": "int64", "vec_b": "int64"}).sort_values(
        ["vec_a", "vec_b"]
    ).reset_index(drop=True)
