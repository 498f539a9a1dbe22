"""Benchmark decontamination: flag corpus documents that share any
token n-gram with a (small) benchmark/eval set.

The real-world shape is benchmark ≪ corpus, so the benchmark's gram set
is built once and broadcast (``ray.put``) — every corpus batch then
does a C-speed hash-table membership probe (``pd.Series.isin``) with no
shuffle at all; the corpus streams through a single ``map_batches``.
For a benchmark too large to broadcast, fall back to a distributed
inner join on a gram-hash key (same pattern as
``functions/dedup.py``'s shingle join) — the broadcast path is the
default because eval sets are MBs while the corpus is TBs.

Tokenization = the SQL-expressible punct tokenizer + stopword filter
(same stream the index analyzes), grams are the literal joined token
strings, so membership is exact and a DuckDB oracle can rebuild the
same grams with a list comprehension.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..analysis.stopwords import STOP_WORDS


def _doc_grams(texts: pa.Array | pa.ChunkedArray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, gram_string) arrays for every n-gram of the filtered
    token stream of each text — fully vectorized (n-1 object-array
    concats; no per-doc Python loop)."""
    import pyarrow.compute as pc

    from ..analysis.batch import _tokenize_arrow

    toks = _tokenize_arrow(texts, "punct")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    if len(flat) == 0:
        return np.empty(0, np.int64), np.empty(0, object)
    dic = pc.dictionary_encode(flat)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(dic.dictionary.to_pylist(), dtype=object)
    keep_vocab = np.array([t != "" and t not in STOP_WORDS for t in vocab], dtype=bool)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = keep_vocab[codes]
    codes, doc_idx = codes[keep], doc_idx[keep]
    if len(codes) < n:
        return np.empty(0, np.int64), np.empty(0, object)
    tok_strs = vocab[codes]
    # valid gram start: all n tokens in the same doc
    ok = doc_idx[: len(doc_idx) - n + 1] == doc_idx[n - 1 :]
    starts = np.flatnonzero(ok)
    if len(starts) == 0:
        return np.empty(0, np.int64), np.empty(0, object)
    grams = tok_strs[starts].astype(object)
    for i in range(1, n):
        # object arrays concatenate elementwise (one vector op per i)
        grams = grams + " " + tok_strs[starts + i].astype(object)
    return doc_idx[starts], grams


def benchmark_gram_set(bench_ds, text_column: str = "text", n: int = 8) -> set:
    """Collect the benchmark's distinct grams (benchmark is small by
    assumption — MBs of eval data; per-batch dedup keeps the driver
    union cheap)."""

    def batch_grams(b: pa.Table) -> pa.Table:
        _, grams = _doc_grams(b[text_column], n)
        return pa.table({"gram": pa.array(pd.unique(grams), pa.string())})

    out = set()
    for b in bench_ds.map_batches(batch_grams, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        out.update(b["gram"].to_pylist())
    return out


def contaminated_ids(
    corpus_ds,
    gram_set: set,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 8,
):
    """Dataset of ``id_column`` values of corpus docs sharing ≥1 n-gram
    with the broadcast gram set. Single streaming pass."""
    import ray

    ref = ray.put(np.asarray(sorted(gram_set), dtype=object))

    def probe(b: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        doc_idx, grams = _doc_grams(b[text_column], n)
        ids = b[id_column].to_numpy(zero_copy_only=False)
        if len(grams) == 0:
            return pa.table({id_column: pa.array([], b[id_column].type)})
        hit = pd.Series(grams).isin(bench).to_numpy()
        bad = np.unique(doc_idx[hit])
        return pa.table({id_column: pa.array(ids[bad], b[id_column].type)})

    return corpus_ds.map_batches(probe, batch_format="pyarrow")
