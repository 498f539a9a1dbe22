"""Analysis chain: tokenizers, stopwords, stemmer, analyzers, batch kernels."""

from .analyzer import ComposableAnalyzer, NaiveAnalyzer, default_analyzer
from .batch import NAIVE, PUNCT_ONLY, PUNCT_PORTER, TermMapper, analyze_docs
from .porter import PorterStemmer
from .stopwords import EN_STOP_WORDS, JA_STOP_WORDS, STOP_WORDS
from .tokenizers import NaiveTokenizer, PunctuationTokenizer
from .wordbreak import (
    NO_BREAK_MSG,
    WordBreakCJKTokenizer,
    WordBreakTokenizer,
    load_freq_dict,
)

__all__ = [
    "ComposableAnalyzer",
    "NaiveAnalyzer",
    "default_analyzer",
    "PorterStemmer",
    "PunctuationTokenizer",
    "NaiveTokenizer",
    "WordBreakTokenizer",
    "WordBreakCJKTokenizer",
    "load_freq_dict",
    "NO_BREAK_MSG",
    "STOP_WORDS",
    "EN_STOP_WORDS",
    "JA_STOP_WORDS",
    "TermMapper",
    "analyze_docs",
    "PUNCT_PORTER",
    "PUNCT_ONLY",
    "NAIVE",
]
