"""Dictionary word-break tokenizers.

Reference semantics:

- ``WordBreakTokenizer`` (EN; reference ``analysis/WordBreakTokenizer.java:71-148``):
  given a frequency dictionary, break a space-less string into the
  segmentation maximizing the product of token probabilities
  ``freq/total``; case-insensitive dictionary match; output lowercase;
  stop words removed *after* segmentation; unbreakable input raises
  ``ValueError("there's no possible way to break the string")``; empty
  input returns ``[]``. The reference explores paths by exponential DFS —
  we use an O(n·maxlen) Viterbi DP in log-space (identical argmax; avoids
  the reference's float underflow on very long inputs).

- ``WordBreakCJKTokenizer`` (reference ``analysis/WordBreakCJKTokenizer.java:79-144``):
  jieba-style: the dictionary is augmented with zero-frequency prefix
  entries; build a DAG of dictionary matches, take the max-probability
  path by forward DP, reconstruct from a predecessor array. We reproduce
  the reference's predecessor-walk behavior exactly, including its quirk
  that an unreachable end emits ``text[0:end]`` as a single token.

Dictionaries are loaded once per instance (→ once per Ray actor when used
inside an actor-pool ``map_batches`` stage); file format is ``word freq``
per line with optional UTF-8 BOM (reference ``WordBreakTokenizer.java:53-59``).
"""

from __future__ import annotations

import math
from pathlib import Path

from .stopwords import STOP_WORDS

NO_BREAK_MSG = "there's no possible way to break the string"


def load_freq_dict(path: str | Path) -> dict[str, float]:
    """Parse ``word freq`` lines (BOM-stripped, whitespace-split)."""
    out: dict[str, float] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.removeprefix("﻿").strip()
            if not line:
                continue
            cols = line.split()
            out[cols[0]] = float(cols[1])
    return out


class WordBreakTokenizer:
    """Max-product dictionary segmentation of space-less (EN) text."""

    def __init__(self, word_dict: dict[str, float] | str | Path):
        if not isinstance(word_dict, dict):
            word_dict = load_freq_dict(word_dict)
        self.word_dict = word_dict
        self.total = float(sum(word_dict.values()))
        self.max_word_len = max((len(w) for w in word_dict), default=0)
        self._log_total = math.log(self.total) if self.total > 0 else 0.0

    def tokenize(self, text: str) -> list[str]:
        if len(text) == 0:
            return []
        s = text.lower()
        n = len(s)
        d = self.word_dict
        log_total = self._log_total
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back = [-1] * (n + 1)
        best[0] = 0.0
        maxlen = self.max_word_len
        for j in range(1, n + 1):
            lo = max(0, j - maxlen)
            bj, bb = NEG, -1
            for i in range(lo, j):
                bi = best[i]
                if bi == NEG:
                    continue
                w = s[i:j]
                f = d.get(w)
                if f is None or f <= 0:
                    continue
                cand = bi + math.log(f) - log_total
                if cand > bj:
                    bj, bb = cand, i
            best[j], back[j] = bj, bb
        if best[n] == NEG:
            raise ValueError(NO_BREAK_MSG)
        # reconstruct
        spans: list[tuple[int, int]] = []
        j = n
        while j > 0:
            i = back[j]
            spans.append((i, j))
            j = i
        spans.reverse()
        return [s[i:j] for i, j in spans if s[i:j] not in STOP_WORDS]

    __call__ = tokenize


class WordBreakCJKTokenizer:
    """jieba-style DAG max-probability segmentation (JP/CN)."""

    def __init__(self, word_dict: dict[str, float] | str | Path):
        if not isinstance(word_dict, dict):
            word_dict = load_freq_dict(word_dict)
        # augment with zero-freq prefixes (reference WordBreakCJKTokenizer.java:67-71)
        aug: dict[str, float] = {}
        total = 0.0
        for word, freq in word_dict.items():
            total += freq
            aug[word] = freq
            for i in range(1, len(word)):
                aug.setdefault(word[:i], 0.0)
        # setdefault must not clobber real entries added later: re-assert reals
        for word, freq in word_dict.items():
            aug[word] = freq
        self.word_dict = aug
        self.total = total

    def _dag(self, s: str) -> list[list[int]]:
        d = self.word_dict
        dag: list[list[int]] = []
        n = len(s)
        for i in range(n):
            ends: list[int] = []
            j = i
            frag = s[i : i + 1]
            while j < n and frag in d:
                if d[frag] > 0:
                    ends.append(j + 1)
                j += 1
                if j < n:
                    frag = s[i : j + 1]
            dag.append(ends)
        return dag

    def tokenize(self, text: str) -> list[str]:
        if len(text) == 0:
            raise ValueError(NO_BREAK_MSG)
        dag = self._dag(text)
        n = len(dag)
        d = self.word_dict
        log_total = math.log(self.total) if self.total > 0 else 0.0
        NEG = float("-inf")
        # forward longest-path DP in log space (reference findMaxPath, :122-144)
        dist = [NEG] * (n + 1)
        pre = [0] * (n + 1)
        dist[0] = 0.0
        for i in range(n):
            if dist[i] == NEG:
                continue
            for j in dag[i]:
                p = d[text[i:j]]
                cand = dist[i] + (math.log(p) - log_total if p > 0 else NEG)
                if cand > dist[j]:
                    pre[j] = i
                    dist[j] = cand
        # predecessor walk, reproducing the reference's unreachable-end quirk
        tokens: list[str] = []
        cur = n
        while cur != pre[cur]:
            word = text[pre[cur] : cur]
            if word not in STOP_WORDS:
                tokens.append(word)
            cur = pre[cur]
        tokens.reverse()
        return tokens

    __call__ = tokenize
