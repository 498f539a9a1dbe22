"""Anchor-text aggregation — the web-search signal PageRank doesn't
carry: the words OTHER pages use when linking to a document (classic
anchor-text indexing, Brin & Page 1998 §2.2).

Pipeline shape (all streaming ``map_batches``):

    html → extract links (href + anchor text, ``extract/html.py``)
         → resolve href → target doc id
         → tokenize anchor text (the shared SQL-mirrorable tokenizer)
         → explode (target, term)
         → groupby(target, term).count

The per-target anchor-term table is the thing a production engine merges
into the index as a boosted field; here it is a standalone operator so
the driver can hash-verify the whole chain (render → parse → aggregate)
against a SQL mirror that derives the same links arithmetically.

Scale notes: anchor extraction is embarrassingly parallel; the only
shuffle is the final (target, term) groupby whose cardinality is
vocabulary-bounded per target. Hot targets (every page links to the
homepage) skew that groupby — the per-batch partial count below
collapses duplicate (target, term) pairs inside each batch before the
exchange, the same combiner pattern the postings builder uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def links_to_term_counts(batch: pa.Table, html_column: str = "html") -> pa.Table:
    """One batch of HTML pages → partial (target_doc, term, c) counts.

    href scheme ``doc://<int>`` resolves to a doc id; other hrefs are
    dropped (external links would route to a URL→id map stage)."""
    from ..extract.html import extract_links
    from .textstats import _token_lists

    targets: list[int] = []
    anchors: list[str] = []
    for page in batch[html_column].to_pylist():
        for href, text in extract_links(page):
            if href.startswith("doc://"):
                try:
                    targets.append(int(href[6:]))
                except ValueError:
                    continue
                anchors.append(text)
    if not targets:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "term": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
    toks = _token_lists(pd.Series(anchors))
    lens = toks.map(len).to_numpy(np.int64)
    dst = np.repeat(np.asarray(targets, np.int64), lens)
    flat = np.concatenate([t for t in toks if len(t)]) if lens.sum() else np.array([], object)
    df = pd.DataFrame({"doc_id": dst, "term": flat})
    part = df.groupby(["doc_id", "term"], as_index=False).size()
    return pa.table(
        {
            "doc_id": pa.array(part["doc_id"].to_numpy(np.int64), pa.int64()),
            "term": pa.array(part["term"].astype(str).to_numpy(), pa.string()),
            "c": pa.array(part["size"].to_numpy(np.int64), pa.int64()),
        }
    )


def anchor_term_counts(pages_ds, html_column: str = "html") -> pd.DataFrame:
    """Full anchor-text aggregation over a pages Dataset: per-batch
    partial counts (combiner) → one (doc_id, term) groupby-sum."""
    from ray.data.aggregate import Sum

    out = (
        pages_ds.map_batches(
            lambda b: links_to_term_counts(b, html_column), batch_format="pyarrow"
        )
        .groupby(["doc_id", "term"])
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64", "n": "int64"})
