"""Analyze stage: ``map_batches`` actor turning web-page rows into per-doc
term vectors.

Replaces the reference's sequential ``InvertedIndexManager.addDocument``
analysis+accumulation loop (``InvertedIndexManager.java:303-321``) with a
stateful actor-pool batch transform: the term mapper (stemmer memo /
word-break dictionaries) is built once per actor in ``__init__`` (reference
state table: SURVEY.md §2.3 T1/T4), each ``__call__`` runs the vectorized
kernel in ``analysis.batch``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.batch import PUNCT_PORTER, TermMapper, analyze_docs
from ..extract.html import extract_batch, extract_text

_URL_INT = re.compile(r"(\d+)(?:\.[A-Za-z0-9]+)?/?$")


def doc_ids_from_urls(urls: list[str | None], mode: str) -> np.ndarray:
    """Deterministic, parallelism-independent doc-id assignment.

    - ``url_index``: parse the trailing integer of the url path (dense ids
      for corpora whose urls encode the row index, like the synthetic
      corpus and the reference's numeric filenames,
      ``IcsSearchEngine.java:43``).
    - ``hash``: 63-bit blake2b fingerprint of the url (scalable default
      for arbitrary corpora; never renumbered — SURVEY.md §1.4).
    """
    if mode == "url_index":
        out = np.empty(len(urls), dtype=np.uint64)
        for i, u in enumerate(urls):
            m = _URL_INT.search(u or "")
            if not m:
                raise ValueError(f"url_index doc-id mode: no trailing integer in {u!r}")
            out[i] = int(m.group(1))
        return out
    if mode == "hash":
        out = np.empty(len(urls), dtype=np.uint64)
        for i, u in enumerate(urls):
            h = hashlib.blake2b((u or "").encode(), digest_size=8).digest()
            out[i] = int.from_bytes(h, "big") >> 1  # keep in int64-safe range
        return out
    raise ValueError(f"unknown doc_id mode: {mode}")


class AnalyzeStage:
    """``map_batches`` callable class (actor pool when ``concurrency`` set).

    Input batch: Arrow table with a text column (or html to extract).
    Output: ``doc_id:uint64, dl:int32, terms:list<string>, tfs:list<int32>
    [, positions:list<list<int32>>]``.
    """

    def __init__(
        self,
        mode: str = PUNCT_PORTER,
        positional: bool = True,
        text_column: str = "text",
        html_column: str | None = None,
        doc_id_column: str | None = None,
        doc_id_mode: str = "hash",
        url_column: str = "url",
        validate_extraction: bool = False,
    ):
        self.mapper = TermMapper(mode)
        self.positional = positional
        self.text_column = text_column
        self.html_column = html_column
        self.doc_id_column = doc_id_column
        self.doc_id_mode = doc_id_mode
        self.url_column = url_column
        self.validate_extraction = validate_extraction

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.html_column is not None and self.html_column in batch.column_names:
            text = extract_batch(batch[self.html_column])
            if self.validate_extraction and self.text_column in batch.column_names:
                # per-row invariant: extract(html) == text byte-identical
                eq = pc.equal(text, batch[self.text_column].combine_chunks())
                if not pc.all(eq).as_py():
                    bad = pc.index(eq, False).as_py()
                    url = batch[self.url_column][bad].as_py() if self.url_column in batch.column_names else "?"
                    raise AssertionError(f"extract(html) != text for url={url}")
        else:
            text = batch[self.text_column].combine_chunks()

        if self.doc_id_column is not None:
            doc_ids = np.asarray(batch[self.doc_id_column].to_numpy(zero_copy_only=False), dtype=np.uint64)
        else:
            doc_ids = doc_ids_from_urls(batch[self.url_column].to_pylist(), self.doc_id_mode)

        return analyze_docs(text.to_pandas(), doc_ids, self.mapper, positional=self.positional)


# per-worker stage cache: Ray worker processes are long-lived, so a plain
# TASK-based map_batches reuses the same AnalyzeStage (stemmer memo) across
# tasks in a worker — actor-pool state amortization without paying the
# multi-second actor-pool spin-up per pipeline.
_WORKER_STAGES: dict[tuple, "AnalyzeStage"] = {}


def make_analyze_fn(**kwargs):
    key = tuple(sorted(kwargs.items()))

    def analyze_fn(batch: pa.Table) -> pa.Table:
        stage = _WORKER_STAGES.get(key)
        if stage is None:
            stage = AnalyzeStage(**kwargs)
            _WORKER_STAGES[key] = stage
        return stage(batch)

    return analyze_fn


class WordBreakStage:
    """Actor-pool stage for dictionary word-break tokenization of space-less
    text (reference ``WordBreakTokenizer.java`` / ``WordBreakCJKTokenizer``).

    The frequency dictionary loads once per actor (SURVEY.md §2.3 T1);
    output adds a ``tokens: list<string>`` column.
    """

    def __init__(self, dict_path_or_mapping, cjk: bool = False, text_column: str = "text"):
        from ..analysis.wordbreak import WordBreakCJKTokenizer, WordBreakTokenizer

        cls = WordBreakCJKTokenizer if cjk else WordBreakTokenizer
        self.tokenizer = cls(dict_path_or_mapping)
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = [self.tokenizer.tokenize(t or "") for t in batch[self.text_column].to_pylist()]
        return batch.append_column("tokens", pa.array(toks, pa.list_(pa.string())))
