"""Web-corpus search: TF-IDF combined with PageRank
(reference ``search/IcsSearchEngine.java``).

The reference's corpus conventions (doc text line0 = docID, line1 = URL,
``IcsSearchEngine.java:195``) are replaced by explicit columns; the
combined score is ``tfidf + pagerank_weight × pagerank[doc_id]``
(``:188-218``), sorted descending, truncated to top-k."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..query.engine import SearchEngine
from .pagerank import pagerank_numpy, pagerank_ray, pagerank_scores_sorted


class WebSearchEngine:
    def __init__(self, index_dir: str | Path):
        self.engine = SearchEngine(index_dir)
        self.pagerank: np.ndarray | None = None

    def compute_pagerank(
        self, edges, n: int | None = None, num_iterations: int = 100, use_ray: bool = False
    ) -> np.ndarray:
        """edges: numpy (m,2) [src,dst] or a Ray Dataset with src/dst."""
        if n is None:
            n = self.engine.num_docs()
        if use_ray:
            self.pagerank = pagerank_ray(edges, n, num_iterations)
        else:
            self.pagerank = pagerank_numpy(np.asarray(edges), n, num_iterations)
        return self.pagerank

    def get_pagerank_scores(self) -> list[tuple[int, float]]:
        assert self.pagerank is not None, "call compute_pagerank first"
        return pagerank_scores_sorted(self.pagerank)

    def search_query(
        self, query: list[str], topk: int, pagerank_weight: float
    ) -> list[tuple[int, float]]:
        """Combined-score ranked search (reference ``searchQuery``:
        TF-IDF over ALL matches (topK=null), add weighted PageRank,
        re-sort descending, truncate). Ties: (-score, doc_id)."""
        assert self.pagerank is not None, "call compute_pagerank first"
        tfidf = self.engine.search_tfidf(query, None)
        combined = [
            (doc, score + pagerank_weight * float(self.pagerank[doc])) for doc, score in tfidf
        ]
        combined.sort(key=lambda x: (-x[1], x[0]))
        return combined[:topk]
