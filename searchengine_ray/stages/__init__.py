"""Ray Data stages: analyze (actor pool), explode, posting-shard reduce."""

from .postings import (
    POSTINGS_SCHEMA,
    PostingShardWriter,
    build_shard_blocks,
    explode_batch,
    explode_partials,
    term_shard,
)
from .tokenize import AnalyzeStage, WordBreakStage, doc_ids_from_urls

__all__ = [
    "AnalyzeStage",
    "WordBreakStage",
    "doc_ids_from_urls",
    "explode_batch",
    "explode_partials",
    "build_shard_blocks",
    "PostingShardWriter",
    "POSTINGS_SCHEMA",
    "term_shard",
]
