"""Deterministic HTML → text extraction.

The reference ingests pre-extracted "cleaned" pages
(``search/IcsSearchEngine.java:40-48``) and ships no extractor, so this spec
is fixed by this repo (SURVEY.md §7.1) and pinned by golden fixtures — the
``input_hint`` invariant is ``extract(html) == text`` **byte-identical per
url** against the corpus generator in ``sources/webpages.py``.

Spec (applied in order):

1. decode UTF-8 (``errors="replace"``),
2. remove comments ``<!-- ... -->`` (non-greedy, dotall),
3. remove ``<script>…</script>`` and ``<style>…</style>`` blocks
   (case-insensitive, dotall, attributes allowed on the open tag),
4. replace every remaining tag ``<[^>]*>`` with a single space,
5. decode HTML character references (named + numeric, via
   ``html.unescape``),
6. collapse ``[ \\t\\r\\n\\f\\x0b]+`` runs to one space and strip ends.

No external parser library — the spec must never drift with a dependency
version (SURVEY.md §7.4 "byte-identical extraction").

The spec is TOTAL on adversarial input (unclosed tags/comments/scripts,
``>`` inside attributes, CDATA, non-UTF-8 bytes, charset declarations,
surrogate numeric entities): each degrades deterministically per the
rules above — behavior pinned byte-exactly by
``tests/test_extract.py::TestExtractAdversarial``. Notably a charset
declaration never switches decoding (rule 1 always applies), and
``html.unescape`` follows the HTML5 without-semicolon prefix rule.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_SCRIPT = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.S | re.I)
_STYLE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.S | re.I)
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"[ \t\r\n\f\x0b]+")


def extract_text(html_bytes: bytes | str) -> str:
    """Extract plain text from one HTML document (row path)."""
    s = html_bytes.decode("utf-8", errors="replace") if isinstance(html_bytes, bytes) else html_bytes
    s = _COMMENT.sub("", s)
    s = _SCRIPT.sub(" ", s)
    s = _STYLE.sub(" ", s)
    s = _TAG.sub(" ", s)
    s = _html.unescape(s)
    return _WS.sub(" ", s).strip()


def extract_batch(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized-ish batch extraction (regex per row, C-loop dispatch)."""
    vals = html_col.to_pandas()
    out = np.empty(len(vals), dtype=object)
    for i, v in enumerate(vals):
        out[i] = extract_text(v) if v is not None else None
    return pa.array(pd.Series(out), type=pa.string())


class HtmlExtractStage:
    """``map_batches`` stage: ``html:binary`` → adds/overwrites ``text``.

    Stateless but shipped as a class so regexes stay compiled per actor
    when used with ``concurrency=N``.
    """

    def __init__(self, html_column: str = "html", text_column: str = "text"):
        self.html_column = html_column
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = extract_batch(batch[self.html_column])
        if self.text_column in batch.column_names:
            idx = batch.column_names.index(self.text_column)
            return batch.set_column(idx, self.text_column, text)
        return batch.append_column(self.text_column, text)


# ------------------------------------------------------- link extraction

_ANCHOR = re.compile(r'<a\b[^>]*\bhref\s*=\s*"([^"]*)"[^>]*>(.*?)</a\s*>', re.S | re.I)


def extract_links(html_bytes: bytes | str) -> list[tuple[str, str]]:
    """(href, anchor_text) pairs from one HTML document. Anchor text goes
    through the same tag-strip → unescape → whitespace-collapse pipeline
    as body text, so nested markup inside the anchor is handled."""
    s = (
        html_bytes.decode("utf-8", errors="replace")
        if isinstance(html_bytes, bytes)
        else html_bytes
    )
    s = _COMMENT.sub("", s)
    out = []
    for href, inner in _ANCHOR.findall(s):
        txt = _WS.sub(" ", _html.unescape(_TAG.sub(" ", inner))).strip()
        out.append((href, txt))
    return out
