"""Token n-gram (bigram) co-occurrence counts over a text column.

A training-data staple (collocation mining, tokenizer-merge statistics,
contamination probes). The heavy pass is the combiner pattern used by
the index build shuffle: each batch tokenizes with the shared Arrow
tokenizer, counts its own bigrams with integer codes (one
``np.unique`` over a packed 64-bit pair key — no Python pair tuples),
and emits one partial-count row per distinct (t1, t2) per batch; a
``groupby(t1, t2).sum()`` whose cardinality is the bigram vocabulary
(Zipfian, ≪ token count) finishes the job. Top-k happens on the
already-aggregated result.

Tokenization is the simple SQL-expressible tokenizer (lower → strip
``[,.;?!]`` → whitespace split, NO stopword removal), so bigrams are
adjacency in the raw token stream and a DuckDB oracle can zip
``unnest``/``generate_subscripts`` and self-join on position+1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def bigram_partial_counts(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Per-batch partial bigram counts: (t1, t2, n_part)."""
    import pyarrow.compute as pc

    from ..analysis.batch import _tokenize_arrow

    toks = _tokenize_arrow(batch[text_column], "punct")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    # drop empty tokens while keeping per-doc adjacency: empties only occur
    # from consecutive separators; the tokenizer's split already yields ''
    # entries we must remove *before* pairing (the analyzed stream and the
    # SQL oracle both drop them).
    if len(flat) == 0:
        return pa.table(
            {
                "t1": pa.array([], pa.string()),
                "t2": pa.array([], pa.string()),
                "n_part": pa.array([], pa.int64()),
            }
        )
    dic = pc.dictionary_encode(flat)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(dic.dictionary.to_pylist(), dtype=object)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)

    keep_vocab = vocab != ""
    nonempty = keep_vocab[codes]
    codes, doc_idx = codes[nonempty], doc_idx[nonempty]

    if len(codes) < 2:
        return pa.table(
            {
                "t1": pa.array([], pa.string()),
                "t2": pa.array([], pa.string()),
                "n_part": pa.array([], pa.int64()),
            }
        )
    same_doc = doc_idx[1:] == doc_idx[:-1]
    a = codes[:-1][same_doc]
    b = codes[1:][same_doc]
    if len(a) == 0:
        return pa.table(
            {
                "t1": pa.array([], pa.string()),
                "t2": pa.array([], pa.string()),
                "n_part": pa.array([], pa.int64()),
            }
        )
    # pack the pair into one uint64 key (vocab is per-batch, < 2^32)
    key = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
    uniq, n = np.unique(key, return_counts=True)
    t1 = vocab[(uniq >> np.uint64(32)).astype(np.int64)]
    t2 = vocab[(uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)]
    return pa.table(
        {
            "t1": pa.array(t1, pa.string()),
            "t2": pa.array(t2, pa.string()),
            "n_part": pa.array(n, pa.int64()),
        }
    )


def bigram_counts(ds, text_column: str = "text", top_k: int | None = None) -> pd.DataFrame:
    """Global bigram counts (t1, t2, n), optionally the top-k by count.

    One combiner shuffle; ties in the top-k break by (t1, t2) ascending
    so the result is deterministic and oracle-comparable.
    """
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(
            bigram_partial_counts,
            batch_format="pyarrow",
            fn_kwargs={"text_column": text_column},
        )
        .groupby(["t1", "t2"])
        .aggregate(Sum("n_part", alias_name="n"))
    )
    if top_k is None:
        out = agg.to_pandas()
        return out.sort_values(["t1", "t2"]).reset_index(drop=True)

    # per-block partial top-k before the driver sees anything
    def block_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(["n", "t1", "t2"], ascending=[False, True, True])
        return pa.Table.from_pandas(df.head(top_k), preserve_index=False)

    out = agg.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["n", "t1", "t2"], ascending=[False, True, True])
    return out.head(top_k).reset_index(drop=True)


def unigram_partial_counts(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Per-batch partial token counts (t, n_part) — same tokenizer and
    empty-token policy as the bigram pass."""
    import pyarrow.compute as pc

    from ..analysis.batch import _tokenize_arrow

    toks = _tokenize_arrow(batch[text_column], "punct")
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    empty = pa.table(
        {"t": pa.array([], pa.string()), "n_part": pa.array([], pa.int64())}
    )
    if len(flat) == 0:
        return empty
    dic = pc.dictionary_encode(flat)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(dic.dictionary.to_pylist(), dtype=object)
    codes = codes[(vocab != "")[codes]]
    if not len(codes):
        return empty
    uniq, n = np.unique(codes, return_counts=True)
    return pa.table(
        {"t": pa.array(vocab[uniq], pa.string()), "n_part": pa.array(n, pa.int64())}
    )


def collocations_pmi(ds, top_k: int = 20, text_column: str = "text") -> pd.DataFrame:
    """Top-k bigrams by count, scored with pointwise mutual information
    ``pmi = log2((n_ab/B) / ((n_a/T)·(n_b/T)))`` — the collocation
    strength measure tokenizer-merge / phrase-mining pipelines use.

    Scale shape: both count tables stay Datasets (combiner shuffles);
    only the k winning bigrams and the ≤2k unigram rows they reference
    ever reach the driver. Totals are Dataset ``sum`` aggregates."""
    from ray.data.aggregate import Sum

    big_part = ds.map_batches(
        bigram_partial_counts, batch_format="pyarrow",
        fn_kwargs={"text_column": text_column},
    ).materialize()
    uni_part = ds.map_batches(
        unigram_partial_counts, batch_format="pyarrow",
        fn_kwargs={"text_column": text_column},
    ).materialize()
    b_total = int(big_part.sum("n_part") or 0)
    t_total = int(uni_part.sum("n_part") or 0)

    # bigram-cardinality groups — partition-bucket + a pandas (C-hash)
    # inner groupby instead of the native aggregate's per-group Python
    # (same pattern as functions/dedup.py pair counting)
    n_parts = 32

    def add_bpart(b: pa.Table) -> pa.Table:
        import pandas as pd

        h = (
            pd.util.hash_array(b["t1"].to_numpy(zero_copy_only=False))
            * np.uint64(31)
            + pd.util.hash_array(b["t2"].to_numpy(zero_copy_only=False))
        )
        return b.append_column(
            "_bp", pa.array((h % np.uint64(n_parts)).astype(np.int32), pa.int32())
        )

    def sum_bigrams(g) -> pa.Table:
        df = g.to_pandas()
        out = (
            df.groupby(["t1", "t2"], sort=False, as_index=False)["n_part"]
            .sum()
            .rename(columns={"n_part": "n"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    top = (
        big_part.map_batches(add_bpart, batch_format="pyarrow")
        .groupby("_bp")
        .map_groups(sum_bigrams, batch_format="pyarrow")
    )

    def block_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(["n", "t1", "t2"], ascending=[False, True, True])
        return pa.Table.from_pandas(df.head(top_k), preserve_index=False)

    winners = top.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    winners = winners.sort_values(
        ["n", "t1", "t2"], ascending=[False, True, True]
    ).head(top_k).reset_index(drop=True)

    need = sorted(set(winners["t1"]) | set(winners["t2"]))

    def pick(b: pa.Table, _need=frozenset(need)) -> pa.Table:
        mask = np.fromiter(
            (t in _need for t in b["t"].to_pylist()), bool, len(b)
        )
        return b.filter(pa.array(mask))

    uni = (
        uni_part.map_batches(pick, batch_format="pyarrow")
        .groupby("t")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    counts = dict(zip(uni["t"], uni["n"]))
    na = winners["t1"].map(counts).to_numpy(dtype=np.float64)
    nb = winners["t2"].map(counts).to_numpy(dtype=np.float64)
    n_ab = winners["n"].to_numpy(dtype=np.float64)
    pmi = np.log2((n_ab / b_total) / ((na / t_total) * (nb / t_total)))
    winners["pmi"] = np.round(pmi, 6)
    return winners.astype({"n": "int64"})
