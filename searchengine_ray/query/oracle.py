"""Brute-force full-scan oracle — the rank-identity reference.

Mirrors the reference's debug searcher (``search/FullScanSearcher.java:27-40``:
scan every document, re-analyze, compare) and reproduces the exact scoring
formulas (SURVEY.md §7.1): the distributed engine must match this oracle
rank- AND score-identical on the fixture query set.
"""

from __future__ import annotations

import math

from ..analysis.analyzer import ComposableAnalyzer


class FullScanOracle:
    def __init__(self, docs: dict[int, str], analyzer=None, k1: float = 1.2, b: float = 0.75):
        self.analyzer = analyzer or ComposableAnalyzer()
        self.docs = docs
        self.tokens = {d: self.analyzer.analyze(t) for d, t in docs.items()}
        self.tf = {
            d: {t: toks.count(t) for t in set(toks)} for d, toks in self.tokens.items()
        }
        self.df: dict[str, int] = {}
        for tfmap in self.tf.values():
            for t in tfmap:
                self.df[t] = self.df.get(t, 0) + 1
        self.n = len(docs)
        self.avgdl = (sum(len(t) for t in self.tokens.values()) / self.n) if self.n else 0.0
        self.k1, self.b = k1, b

    def _q(self, keywords: list[str], dedup: bool) -> list[str]:
        kws = list(dict.fromkeys(keywords)) if dedup else list(keywords)
        return self.analyzer.analyze(" ".join(kws))

    def search_and(self, keywords: list[str]) -> list[int]:
        toks = self._q(keywords, dedup=True)
        if not toks:
            return []
        return sorted(
            d for d, tfmap in self.tf.items() if all(t in tfmap for t in toks)
        )

    def search_or(self, keywords: list[str]) -> list[int]:
        toks = self._q(keywords, dedup=True)
        return sorted(
            d for d, tfmap in self.tf.items() if any(t in tfmap for t in toks)
        )

    def search_phrase(self, phrase: str) -> list[int]:
        toks = self.analyzer.analyze(phrase)
        if not toks:
            return []
        hits = []
        for d, stream in self.tokens.items():
            for i in range(len(stream) - len(toks) + 1):
                if stream[i : i + len(toks)] == toks:
                    hits.append(d)
                    break
        return sorted(hits)

    def search_tfidf(self, keywords: list[str], topk: int | None) -> list[tuple[int, float]]:
        toks = self.analyzer.analyze(" ".join(keywords))
        if topk == 0 or not toks:
            return []
        idf = {
            t: math.log10(self.n / self.df[t] + 1) for t in set(toks) if self.df.get(t)
        }
        qtf: dict[str, int] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0) + 1
        out = []
        for d in sorted(self.docs):
            dot = 0.0
            length = 0.0
            for t in dict.fromkeys(toks):
                if t not in idf or t not in self.tf[d]:
                    continue
                tfidf = self.tf[d][t] * idf[t]
                dot += tfidf * (qtf[t] * idf[t])
                length += tfidf * tfidf
            if length > 0:
                out.append((d, dot / math.sqrt(length)))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out if topk is None else out[:topk]

    def search_bm25(self, query: str, topk: int | None) -> list[tuple[int, float]]:
        toks = self.analyzer.analyze(query)
        if topk == 0 or not toks:
            return []
        qtf: dict[str, int] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0) + 1
        out = []
        for d in sorted(self.docs):
            dl = len(self.tokens[d])
            score = 0.0
            matched = False
            for t in dict.fromkeys(toks):
                tf = self.tf[d].get(t, 0)
                if tf == 0 or not self.df.get(t):
                    continue
                matched = True
                idf = math.log((self.n - self.df[t] + 0.5) / (self.df[t] + 0.5) + 1.0)
                w = tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
                score += (self.k1 + 1.0) * idf * w * qtf[t]
            if matched:
                out.append((d, score))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out if topk is None else out[:topk]
