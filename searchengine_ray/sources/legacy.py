"""Legacy corpus-convention compatibility (reference M9).

The reference encodes structure inside the single text field: line 0 =
docID, line 1 = URL, rest = page text (``IcsSearchEngine.java:195``,
``IcsSearchEngineTest.java:136-139``). This module parses that convention
into explicit columns so legacy corpora can feed the column-based
pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def parse_legacy_doc(text: str) -> tuple[int, str, str]:
    """``"<id>\\n<url>\\n<body...>"`` → (doc_id, url, body)."""
    lines = text.split("\n")
    doc_id = int(lines[0])
    url = lines[1] if len(lines) > 1 else ""
    body = "\n".join(lines[2:])
    return doc_id, url, body


def parse_legacy_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """``map_batches`` kernel: legacy text rows → (doc_id, url, text)."""
    texts = batch[text_column].to_pylist()
    ids = np.empty(len(texts), dtype=np.int64)
    urls, bodies = [], []
    for i, t in enumerate(texts):
        d, u, b = parse_legacy_doc(t or "0\n")
        ids[i] = d
        urls.append(u)
        bodies.append(b)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "text": pa.array(bodies, pa.string()),
        }
    )


def to_legacy_text(doc_id: int, url: str, body: str) -> str:
    return f"{doc_id}\n{url}\n{body}"
