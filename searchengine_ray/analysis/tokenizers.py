"""Tokenizers.

Row-level semantics follow the reference exactly:

- ``PunctuationTokenizer`` (reference ``analysis/PunctuationTokenizer.java:31-53``):
  replace each of ``, . ; ? !`` with a space, lowercase, split on ``\\s+``,
  drop empty tokens, drop stop words.
- ``NaiveTokenizer`` (reference ``analysis/NaiveAnalyzer.java:10-16``):
  lowercase + split on ``\\s+`` only (debug analyzer; keeps stop words).

Each tokenizer exposes ``tokenize(text) -> list[str]`` (row path, used by
query-side analysis and oracles) — the vectorized batch path lives in
``analysis.batch``.
"""

from __future__ import annotations

import re

from .stopwords import STOP_WORDS

PUNCTUATIONS = frozenset({",", ".", ";", "?", "!"})
# Java String.split("\\s+") whitespace class is [ \t\n\x0B\f\r]
_WS_SPLIT = re.compile(r"[ \t\n\x0b\f\r]+")
_PUNCT_TRANS = str.maketrans({c: " " for c in PUNCTUATIONS})


class PunctuationTokenizer:
    """Punctuation/whitespace tokenizer with stopword removal."""

    def tokenize(self, text: str) -> list[str]:
        parts = _WS_SPLIT.split(text.translate(_PUNCT_TRANS).lower())
        return [t for t in parts if t and t not in STOP_WORDS]

    __call__ = tokenize


def _java_split_ws(text: str) -> list[str]:
    """Java ``String.split("\\\\s+")``: trailing empties removed, a leading
    empty element kept when the string starts with whitespace, and the empty
    string splitting to ``[""]``."""
    parts = _WS_SPLIT.split(text)
    while parts and parts[-1] == "":
        parts.pop()
    if not parts:
        return [""] if text == "" else []
    return parts


class NaiveTokenizer:
    """Lowercase + whitespace split; no punctuation or stopword handling
    (Java-split semantics incl. the leading-empty edge)."""

    def tokenize(self, text: str) -> list[str]:
        return _java_split_ws(text.lower())

    __call__ = tokenize
