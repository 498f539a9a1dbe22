"""Query engine (boolean / phrase / TF-IDF / BM25+WAND) and oracle."""

from .engine import QueryEngineStage, SearchEngine, TermPostings
from .oracle import FullScanOracle
from .service import RoutedSearchEngine, ShardedQueryService

__all__ = [
    "SearchEngine", "QueryEngineStage", "TermPostings", "FullScanOracle",
    "ShardedQueryService", "RoutedSearchEngine",
]
