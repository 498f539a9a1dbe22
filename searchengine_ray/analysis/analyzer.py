"""Analyzers: tokenizer ∘ stemmer composition.

Reference: ``analysis/ComposableAnalyzer.java:20-23`` (tokenize then stem
each token) and ``analysis/NaiveAnalyzer.java:10-16``.
"""

from __future__ import annotations

from collections.abc import Callable

from .porter import PorterStemmer
from .tokenizers import NaiveTokenizer, PunctuationTokenizer


class ComposableAnalyzer:
    """``analyze(text) = [stem(t) for t in tokenize(text)]``."""

    def __init__(
        self,
        tokenizer: Callable[[str], list[str]] | None = None,
        stemmer: Callable[[str], str] | None = None,
    ):
        self.tokenizer = tokenizer if tokenizer is not None else PunctuationTokenizer()
        self.stemmer = stemmer if stemmer is not None else PorterStemmer()

    def analyze(self, text: str) -> list[str]:
        stem = self.stemmer
        return [stem(t) for t in self.tokenizer(text)]

    __call__ = analyze


class NaiveAnalyzer:
    """Debug analyzer: lowercase + whitespace split, no stemming."""

    def __init__(self):
        self.tokenizer = NaiveTokenizer()

    def analyze(self, text: str) -> list[str]:
        return self.tokenizer(text)

    __call__ = analyze


def default_analyzer() -> ComposableAnalyzer:
    """The engine-default analysis chain (punctuation tokenizer + Porter),
    matching the reference's ranked-search chain
    (``InvertedIndexManager.java:579``)."""
    return ComposableAnalyzer(PunctuationTokenizer(), PorterStemmer())
