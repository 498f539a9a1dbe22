"""Training-data pipeline ops: text stats, dedup family, similarity,
multimodal, joins, windows, sampling/selection."""

from . import dedup, joins, multimodal, sampling, similarity, textstats, windows

__all__ = [
    "textstats", "dedup", "similarity", "multimodal", "joins", "windows", "sampling",
]
