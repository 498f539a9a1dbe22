"""KWIC (keyword-in-context) snippet extraction over a corpus.

The classic search-result-preview / term-mining primitive: for every
document containing ``term``, emit a ±``window``-token context around
the FIRST occurrence. One streaming ``map_batches`` pass; inside each
batch everything up to match discovery is Arrow/numpy-vectorized
(lower → punctuation strip → regex split → flat token-equality mask →
per-row first-hit via ``searchsorted``/``unique``); only the final
snippet join loops, and only over the matching rows (selectivity-sized,
window-bounded work — never corpus-sized).

Tokenization mirrors the SQL oracles' shared CTE convention
(``lower``, ``[,.;?!]``→space, whitespace split, empties KEPT so token
positions and ``array_to_string`` joins agree bit-for-bit with DuckDB
``list_position`` / list slicing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PUNCT = "[,.;?!]"
_WS = "[ \t\n\x0b\f\r]+"


def kwic_batch(batch: pa.Table, term: str, window: int = 3,
               id_column: str = "doc_id", text_column: str = "text") -> pa.Table:
    toks = pc.split_pattern_regex(
        pc.replace_substring_regex(pc.utf8_lower(batch[text_column]), _PUNCT, " "),
        _WS,
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values
    mask = pc.equal(values, term).to_numpy(zero_copy_only=False)
    hits = np.flatnonzero(mask)
    empty = pa.table(
        {id_column: pa.array([], pa.int64()), "snippet": pa.array([], pa.string())}
    )
    if not len(hits):
        return empty
    rows = np.searchsorted(offsets[1:], hits, side="right")
    uniq_rows, first = np.unique(rows, return_index=True)
    pos = hits[first] - offsets[uniq_rows]
    ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    # snippet join: matching rows only, ≤(2·window+1) tokens each
    snips = []
    for r, p in zip(uniq_rows, pos):
        lo = offsets[r] + max(0, p - window)
        hi = offsets[r] + min(lens[r], p + window + 1)
        snips.append(" ".join(s.as_py() for s in values.slice(lo, hi - lo)))
    return pa.table(
        {
            id_column: pa.array(ids[uniq_rows], pa.int64()),
            "snippet": pa.array(snips, pa.string()),
        }
    )


def kwic(ds, term: str, window: int = 3,
         id_column: str = "doc_id", text_column: str = "text"):
    """(doc_id, snippet) Dataset — one row per document containing
    ``term``, snippet around its first occurrence."""

    def fn(b: pa.Table) -> pa.Table:
        return kwic_batch(b, term, window, id_column, text_column)

    return ds.map_batches(fn, batch_format="pyarrow")


def snippet_batch(
    batch: pa.Table,
    terms: list[str],
    window: int = 8,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> pa.Table:
    """Best-window snippet with ``<em>`` highlighting for a multi-term
    query: among windows of ``window`` tokens anchored at each query-term
    occurrence, pick the one covering the most DISTINCT query terms
    (ties → earliest), and mark every query token in it.

    Corpus-wide here for oracle verification; in a serving path this
    runs only over the top-k result docs, so the per-anchor loop is
    k-bounded, not corpus-bounded."""
    qset = set(terms)
    toks = pc.split_pattern_regex(
        pc.replace_substring_regex(pc.utf8_lower(batch[text_column]), _PUNCT, " "),
        _WS,
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values
    mask = pc.is_in(values, value_set=pa.array(sorted(qset))).to_numpy(
        zero_copy_only=False
    )
    hits = np.flatnonzero(mask)
    empty = pa.table(
        {id_column: pa.array([], pa.int64()), "snippet": pa.array([], pa.string())}
    )
    if not len(hits):
        return empty
    rows = np.searchsorted(offsets[1:], hits, side="right")
    ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    out_ids, out_snips = [], []
    for r in np.unique(rows):
        row_hits = hits[rows == r] - offsets[r]  # 0-based anchor positions
        row_toks = [s.as_py() for s in values.slice(offsets[r], offsets[r + 1] - offsets[r])]
        best = None  # (−distinct, p)
        for p in row_hits:
            win = row_toks[p : p + window]
            sc = len(qset.intersection(win))
            key = (-sc, p)
            if best is None or key < best:
                best = key
        p = best[1]
        win = row_toks[p : p + window]
        out_ids.append(ids[r])
        out_snips.append(
            " ".join(f"<em>{t}</em>" if t in qset else t for t in win)
        )
    return pa.table(
        {
            id_column: pa.array(out_ids, pa.int64()),
            "snippet": pa.array(out_snips, pa.string()),
        }
    )


def snippets(ds, terms: list[str], window: int = 8,
             id_column: str = "doc_id", text_column: str = "text"):
    def fn(b: pa.Table) -> pa.Table:
        return snippet_batch(b, terms, window, id_column, text_column)

    return ds.map_batches(fn, batch_format="pyarrow")
