"""Index build pipeline + manifest/lineage."""

from .indexer import build_index, dump_postings
from .manifest import IndexManifest

__all__ = ["build_index", "dump_postings", "IndexManifest"]
