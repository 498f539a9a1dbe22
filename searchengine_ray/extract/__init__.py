"""Deterministic HTML → text extraction."""

from .html import HtmlExtractStage, extract_batch, extract_text

__all__ = ["extract_text", "extract_batch", "HtmlExtractStage"]
