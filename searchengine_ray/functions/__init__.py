"""Training-data pipeline ops: text stats, dedup family, similarity, multimodal."""

from . import dedup, multimodal, similarity, textstats

__all__ = ["textstats", "dedup", "similarity", "multimodal"]
