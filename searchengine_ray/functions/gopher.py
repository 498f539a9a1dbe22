"""Gopher-style repetition / quality filters over a text column.

The word-repetition document filters from the public Gopher dataset
paper (Rae et al., "Scaling Language Models: Methods, Analysis &
Insights from Training Gopher", 2021, §A1.1) — the staple curation
pass of every large-scale webtext pipeline:

* ``n_words``          — token count,
* ``mean_word_len``    — characters per token,
* ``dup_word_frac``    — fraction of tokens that repeat an earlier one
                         (``1 - distinct/total``),
* ``top_word_frac``    — fraction of tokens taken by the most frequent
                         token,
* ``top_bigram_frac``  — fraction of adjacent bigrams taken by the most
                         frequent bigram,
* ``keep``             — 0/1 Gopher-style accept decision from fixed
                         thresholds on the above.

Per-doc metrics are embarrassingly parallel: ONE ``map_batches`` pass,
no shuffle, nothing on the driver. The kernel is fully vectorized —
tokens come from the shared Arrow tokenizer (the SQL-expressible
``lower → strip [,.;?!] → whitespace split`` convention every textstats
oracle uses), and per-doc distinct/top counts come from a single
``np.unique`` over packed ``doc_idx * V + code`` int64 keys (no Python
loop over docs or tokens).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Gopher §A1.1 thresholds (word-level subset — the synthetic corpus has
# no newlines, so the line-based rules are vacuous and omitted).
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_DUP_WORD_FRAC = 0.60
MAX_TOP_WORD_FRAC = 0.30
MAX_TOP_BIGRAM_FRAC = 0.18


def _per_doc_max(keys_doc: np.ndarray, counts: np.ndarray, n_docs: int) -> np.ndarray:
    """Max of ``counts`` grouped by ``keys_doc`` — REQUIRES keys_doc
    non-decreasing (np.unique output order), which makes groups
    contiguous and lets ``np.maximum.reduceat`` replace the ~100×
    slower ``np.maximum.at`` scatter."""
    out = np.zeros(n_docs, np.int64)
    if len(keys_doc) == 0:
        return out
    starts = np.flatnonzero(np.r_[True, np.diff(keys_doc) > 0])
    out[keys_doc[starts]] = np.maximum.reduceat(counts, starts)
    return out


def gopher_metrics_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    import pyarrow.compute as pc

    from ..analysis.batch import _tokenize_arrow

    n_docs = batch.num_rows
    doc_ids = batch["doc_id"].cast(pa.int64())
    toks = _tokenize_arrow(batch[text_column], "punct")
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)

    if len(flat) == 0:
        z_i = np.zeros(n_docs, np.int64)
        z_f = np.zeros(n_docs, np.float64)
        return _assemble(doc_ids, z_i, z_f, z_f, z_f, z_f)

    dic = pc.dictionary_encode(flat)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab_len = pc.utf8_length(dic.dictionary).to_numpy(zero_copy_only=False).astype(np.int64)
    is_empty = pc.equal(dic.dictionary, "").to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)

    keep = ~is_empty[codes]
    codes, doc_idx = codes[keep], doc_idx[keep]

    n_words = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    tok_chars = np.bincount(doc_idx, weights=vocab_len[codes].astype(np.float64), minlength=n_docs)

    V = np.int64(len(is_empty))
    uniq_wd, wd_counts = np.unique(doc_idx * V + codes, return_counts=True)
    wd_doc = uniq_wd // V
    n_distinct = np.bincount(wd_doc, minlength=n_docs).astype(np.int64)
    top_word = _per_doc_max(wd_doc, wd_counts.astype(np.int64), n_docs)

    # adjacent bigrams within each doc
    same_doc = doc_idx[1:] == doc_idx[:-1]
    bg_doc = doc_idx[:-1][same_doc]
    bg_key = (bg_doc * V + codes[:-1][same_doc]) * V + codes[1:][same_doc]
    n_bigrams = np.bincount(bg_doc, minlength=n_docs).astype(np.int64)
    if len(bg_key):
        uniq_bg, bg_counts = np.unique(bg_key, return_counts=True)
        top_bigram = _per_doc_max((uniq_bg // V) // V, bg_counts.astype(np.int64), n_docs)
    else:
        top_bigram = np.zeros(n_docs, np.int64)

    safe_n = np.maximum(n_words, 1).astype(np.float64)
    safe_nb = np.maximum(n_bigrams, 1).astype(np.float64)
    mean_word_len = tok_chars / safe_n
    dup_word_frac = 1.0 - n_distinct / safe_n
    top_word_frac = top_word / safe_n
    top_bigram_frac = top_bigram / safe_nb
    return _assemble(
        doc_ids, n_words, mean_word_len, dup_word_frac, top_word_frac, top_bigram_frac
    )


def _assemble(doc_ids, n_words, mean_word_len, dup_word_frac, top_word_frac, top_bigram_frac):
    r = lambda a: np.round(a, 6)  # noqa: E731 — match the oracle's round(x, 6)
    keep = (
        (n_words >= MIN_WORDS)
        & (n_words <= MAX_WORDS)
        & (mean_word_len >= MIN_MEAN_WORD_LEN)
        & (mean_word_len <= MAX_MEAN_WORD_LEN)
        & (dup_word_frac <= MAX_DUP_WORD_FRAC)
        & (top_word_frac <= MAX_TOP_WORD_FRAC)
        & (top_bigram_frac <= MAX_TOP_BIGRAM_FRAC)
    )
    return pa.table(
        {
            "doc_id": doc_ids,
            "n_words": pa.array(np.asarray(n_words, np.int64)),
            "mean_word_len": pa.array(r(mean_word_len), pa.float64()),
            "dup_word_frac": pa.array(r(dup_word_frac), pa.float64()),
            "top_word_frac": pa.array(r(top_word_frac), pa.float64()),
            "top_bigram_frac": pa.array(r(top_bigram_frac), pa.float64()),
            "keep": pa.array(keep.astype(np.int64)),
        }
    )
