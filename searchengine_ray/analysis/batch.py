"""Vectorized batch analysis kernel — the hot path of index construction.

Semantically identical to running ``ComposableAnalyzer(PunctuationTokenizer,
PorterStemmer)`` per row (reference ``analysis/ComposableAnalyzer.java:22``,
``PunctuationTokenizer.java:31-53``) and building the per-document
``term -> positions`` map (reference ``InvertedIndexManager.java:303-319``),
but expressed as numpy/pandas kernels over a whole Arrow batch:

- punctuation replace + lowercase + split: pandas vectorized string ops,
- stem/stopword mapping: computed once per *unique* token per actor
  (Zipfian vocab ⇒ amortized O(1) Python work per token),
- per-(doc, term) grouping + positions: one ``np.lexsort`` + run-length
  pass, emitting zero-copy ``pyarrow`` list arrays.

Positions are indices into the *analyzed* token stream (post stopword
removal, matching the reference which enumerates the analyzer output).
Term order within a document is alphabetical — deterministic regardless of
batch/block boundaries (a document never spans batches).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .porter import PorterStemmer
from .stopwords import STOP_WORDS

# analyzer modes
PUNCT_PORTER = "punct_porter"  # engine default (reference ranked-search chain)
PUNCT_ONLY = "punct"  # punctuation tokenizer, no stemming (SQL-oracle-able)
NAIVE = "naive"  # lowercase + whitespace split only


class TermMapper:
    """token -> final term (or None = dropped); memoized per instance."""

    def __init__(self, mode: str = PUNCT_PORTER):
        if mode not in (PUNCT_PORTER, PUNCT_ONLY, NAIVE):
            raise ValueError(f"unknown analyzer mode: {mode}")
        self.mode = mode
        self._stemmer = PorterStemmer(cache_size=None) if mode == PUNCT_PORTER else None
        self._memo: dict[str, str | None] = {}

    def map_unique(self, uniques: np.ndarray) -> np.ndarray:
        """Map an array of unique raw tokens to final terms (None = drop)."""
        memo = self._memo
        out = np.empty(len(uniques), dtype=object)
        stem = self._stemmer.stem if self._stemmer is not None else None
        naive = self.mode == NAIVE
        for i, tok in enumerate(uniques):
            try:
                out[i] = memo[tok]
                continue
            except KeyError:
                pass
            if tok == "" or (not naive and tok in STOP_WORDS):
                mapped = None
            elif stem is not None:
                mapped = stem(tok)
            else:
                mapped = tok
            if len(memo) > 4_000_000:
                memo.clear()
            memo[tok] = mapped
            out[i] = mapped
        return out


_PUNCT_RE = r"[,.;?!]"
_WS_RE = r"[ \t\n\x0b\f\r]+"


def _tokenize_arrow(texts: pa.Array | pa.ChunkedArray, mode: str) -> pa.ListArray:
    """lowercase → punct strip → whitespace split, entirely in Arrow
    kernels (no per-token Python objects). The single tokenizer used by
    BOTH the batch index path and the per-query row path, so the two can
    never drift."""
    import pyarrow.compute as pc

    s = pc.fill_null(texts, "")
    s = pc.utf8_lower(s)
    if mode != NAIVE:
        s = pc.replace_substring_regex(s, pattern=_PUNCT_RE, replacement=" ")
    out = pc.split_pattern_regex(s, pattern=_WS_RE)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _tokenize_series(texts: pd.Series, mode: str) -> pd.Series:
    """pandas-facing wrapper over the Arrow tokenizer (kept for tests /
    row-path callers)."""
    toks = _tokenize_arrow(pa.array(texts.astype("object"), pa.string()), mode)
    return pd.Series(toks.to_pylist(), index=texts.index, dtype="object")


def analyze_docs(
    texts: Sequence[str] | pd.Series | pa.Array | pa.ChunkedArray,
    doc_ids: np.ndarray,
    mapper: TermMapper,
    positional: bool = True,
) -> pa.Table:
    """Analyze a batch of documents into per-doc term vectors.

    Returns an Arrow table: ``doc_id:uint64, dl:int32 (analyzed token
    count), terms:list<string> (sorted), tfs:list<int32>,
    positions:list<list<int32>>`` (present only when ``positional``).

    Tokenize / flatten / unique-encode run as Arrow kernels; Python
    string objects exist only for the *unique* tokens fed to the
    (memoized) stem/stopword mapper — Zipfian vocab makes that O(vocab),
    not O(tokens), and the hot path stays off the allocator (the
    object-array flatten it replaces was ~2× slower single-process and
    worse under multi-worker memory-bandwidth contention).
    """
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts if isinstance(texts, pd.Series) else pd.Series(texts, dtype="object")
        texts = pa.array(texts.astype("object"), pa.string())
    n_docs = len(texts)
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tok_lists = _tokenize_arrow(texts, mapper.mode)

    import pyarrow.compute as pc

    counts = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(counts.sum())
    flat = pc.list_flatten(tok_lists)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat

    if total:
        dic = pc.dictionary_encode(flat)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = np.asarray(dic.dictionary.to_pylist(), dtype=object)
    else:
        codes, uniques = np.empty(0, np.int64), np.empty(0, object)
    mapped_uniq = mapper.map_unique(uniques)
    keep_uniq = np.array([m is not None for m in mapped_uniq], dtype=bool)

    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    keep = keep_uniq[codes] if total else np.empty(0, bool)
    doc_idx_f = doc_idx[keep]
    codes_f = codes[keep]

    # positions within the analyzed stream, per doc
    dl = np.bincount(doc_idx_f, minlength=n_docs).astype(np.int64)
    doc_starts = np.cumsum(dl) - dl
    positions = np.arange(len(doc_idx_f), dtype=np.int64) - np.repeat(doc_starts, dl)

    # map raw-token codes to final-term ranks (alphabetical for determinism)
    kept_terms = np.asarray(
        [m for m in mapped_uniq if m is not None] or [], dtype=object
    )
    # mapped_uniq may collapse several raw tokens to one stem: factorize terms
    term_codes_uniq = np.full(len(mapped_uniq), -1, dtype=np.int64)
    if len(kept_terms):
        tcodes, tuniq = pd.factorize(kept_terms)
        term_codes_uniq[keep_uniq] = tcodes
        order_alpha = np.argsort(tuniq, kind="stable")
        rank = np.empty(len(tuniq), dtype=np.int64)
        rank[order_alpha] = np.arange(len(tuniq))
        tuniq_sorted = np.asarray(tuniq, dtype=object)[order_alpha]
    else:
        rank = np.empty(0, np.int64)
        tuniq_sorted = kept_terms

    tranks = rank[term_codes_uniq[codes_f]] if len(codes_f) else np.empty(0, np.int64)

    # group by (doc, term-rank); positions already ascending within doc
    order = np.lexsort((positions, tranks, doc_idx_f))
    d_s, t_s, p_s = doc_idx_f[order], tranks[order], positions[order]

    if len(d_s):
        new_run = np.empty(len(d_s), dtype=bool)
        new_run[0] = True
        np.not_equal(d_s[1:], d_s[:-1], out=new_run[1:])
        tchange = t_s[1:] != t_s[:-1]
        new_run[1:] |= tchange
        run_starts = np.flatnonzero(new_run)
        run_lens = np.diff(np.append(run_starts, len(d_s)))
        run_doc = d_s[run_starts]
        run_term = t_s[run_starts]
    else:
        run_starts = np.empty(0, np.int64)
        run_lens = np.empty(0, np.int64)
        run_doc = np.empty(0, np.int64)
        run_term = np.empty(0, np.int64)

    runs_per_doc = np.bincount(run_doc, minlength=n_docs)
    doc_offsets = np.concatenate(([0], np.cumsum(runs_per_doc))).astype(np.int32)

    terms_flat = pa.array(tuniq_sorted[run_term], type=pa.string())
    terms_col = pa.ListArray.from_arrays(pa.array(doc_offsets, pa.int32()), terms_flat)
    tfs_col = pa.ListArray.from_arrays(
        pa.array(doc_offsets, pa.int32()), pa.array(run_lens, pa.int32())
    )
    cols = {
        "doc_id": pa.array(doc_ids, pa.uint64()),
        "dl": pa.array(dl, pa.int32()),
        "terms": terms_col,
        "tfs": tfs_col,
    }
    if positional:
        run_offsets = np.concatenate(([0], np.cumsum(run_lens))).astype(np.int32)
        inner = pa.ListArray.from_arrays(
            pa.array(run_offsets, pa.int32()), pa.array(p_s, pa.int32())
        )
        cols["positions"] = pa.ListArray.from_arrays(pa.array(doc_offsets, pa.int32()), inner)
    return pa.table(cols)


def analyze_texts_rowwise(text: str, mapper: TermMapper) -> list[str]:
    """Row-path analysis with identical semantics (used for queries/oracle)."""
    toks = _tokenize_series(pd.Series([text]), mapper.mode).iloc[0]
    mapped = mapper.map_unique(np.asarray(pd.unique(np.asarray(toks, dtype=object))))
    lut = dict(zip(pd.unique(np.asarray(toks, dtype=object)), mapped))
    return [lut[t] for t in toks if lut[t] is not None]
