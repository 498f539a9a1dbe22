"""Ranking beyond the index: PageRank + combined web search."""

from .pagerank import pagerank_numpy, pagerank_ray, pagerank_scores_sorted
from .web import WebSearchEngine

__all__ = ["pagerank_numpy", "pagerank_ray", "pagerank_scores_sorted", "WebSearchEngine"]
