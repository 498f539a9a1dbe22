"""Term-routed query serving: RoutedSearchEngine (scatter-gather through
shard-owner actors) must be result-identical to the local SearchEngine
on every scorer, and routing must only ever touch an actor's own shards
(the misrouted-shard assert inside _ShardOwner)."""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_ray.build import build_index
from searchengine_ray.query.engine import SearchEngine
from searchengine_ray.query.service import RoutedSearchEngine, ShardedQueryService
from tests.test_build import write_docs_parquet
from tests.test_query import DOCS


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("svc_corpus")
    write_docs_parquet(d / "docs.parquet", DOCS)
    idx = tmp_path_factory.mktemp("svc_index")
    build_index(
        str(d / "docs.parquet"), idx, doc_id_column="doc_id",
        num_shards=4, block_size=2,
    )
    return idx


@pytest.fixture(scope="module")
def engines(index_dir):
    local = SearchEngine(index_dir)
    svc = ShardedQueryService(index_dir, num_actors=3)  # != num_shards on purpose
    routed = RoutedSearchEngine(index_dir, svc)
    yield local, routed
    svc.shutdown()


QUERIES = (["cat", "dog"], ["summer", "pizza"], ["toy"], ["zebra"], ["pizza", "house"])


class TestRoutedIdentity:
    def test_boolean(self, engines):
        local, routed = engines
        for q in QUERIES:
            assert routed.search_and(q).tolist() == local.search_and(q).tolist()
            assert routed.search_or(q).tolist() == local.search_or(q).tolist()

    def test_phrase(self, engines):
        local, routed = engines
        for p in ("pizza house", "summer pizza house", "cat dog", "dog cat"):
            assert routed.search_phrase(p).tolist() == local.search_phrase(p).tolist()

    def test_bm25_all_methods(self, engines):
        local, routed = engines
        for q in QUERIES:
            for method in ("exhaustive", "wand", "maxscore", "auto"):
                a = routed.search_bm25(q, topk=5, method=method)
                b = local.search_bm25(q, topk=5, method=method)
                assert a == b, (q, method)  # ids AND scores bit-identical

    def test_tfidf(self, engines):
        local, routed = engines
        assert routed.search_tfidf(["cat", "toy"], topk=5) == local.search_tfidf(
            ["cat", "toy"], topk=5
        )
