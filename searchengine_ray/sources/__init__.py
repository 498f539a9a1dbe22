"""Synthetic corpus + link-graph generators and readers."""

from .webpages import CHUNK, generate_chunk, generate_corpus, render_html

__all__ = ["generate_corpus", "generate_chunk", "render_html", "CHUNK"]
