"""Actor-pool batch-query stage tests (SURVEY.md §3.2 Ray-native query
path): results through the Dataset pipeline equal driver-side engine calls."""

from __future__ import annotations

import pyarrow as pa
import pytest

from searchengine_ray.query import QueryEngineStage, SearchEngine


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    from searchengine_ray.build import build_index
    from tests.test_build import write_docs_parquet
    from tests.test_query import DOCS

    d = tmp_path_factory.mktemp("qs")
    write_docs_parquet(d / "docs.parquet", DOCS)
    idx = tmp_path_factory.mktemp("qsidx")
    build_index(str(d / "docs.parquet"), idx, doc_id_column="doc_id", num_shards=2)
    return idx


@pytest.mark.parametrize("kind", ["bm25", "tfidf", "and", "or", "phrase"])
def test_stage_matches_engine(ray_session, small_index, kind):
    import ray.data as rd

    queries = ["cat dog", "summer pizza house", "toy"]
    tbl = pa.table({"qid": pa.array(range(len(queries)), pa.int64()), "query": pa.array(queries)})
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            QueryEngineStage,
            fn_constructor_kwargs=dict(index_dir=str(small_index), kind=kind, topk=5),
            batch_format="pyarrow",
            batch_size=2,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["qid", "rank"])
    )
    eng = SearchEngine(small_index)
    for qid, q in enumerate(queries):
        got = out[out["qid"] == qid]
        if kind == "bm25":
            want = eng.search_bm25(q, topk=5)
        elif kind == "tfidf":
            want = eng.search_tfidf(q.split(), topk=5)
        elif kind == "and":
            want = [(int(d), 1.0) for d in eng.search_and(q.split())]
        elif kind == "or":
            want = [(int(d), 1.0) for d in eng.search_or(q.split())]
        else:
            want = [(int(d), 1.0) for d in eng.search_phrase(q)]
        assert got["doc_id"].tolist() == [d for d, _ in want], (kind, q)
        assert got["score"].tolist() == pytest.approx([s for _, s in want]), (kind, q)


class TestShardedQueryService:
    """Term-range actor routing (SURVEY §3.2): shard-owner actors serve
    term lookups; every scorer must return identical results through the
    routed path."""

    def test_routed_engine_matches_local(self, ray_session, tmp_path):
        from searchengine_ray.build import build_index
        from searchengine_ray.query import (
            RoutedSearchEngine,
            SearchEngine,
            ShardedQueryService,
        )
        from tests.test_build import write_docs_parquet

        docs = {
            i: f"alpha w{i % 11} beta g{i % 5} gamma delta house pizza"[: 40 + i % 30]
            for i in range(120)
        }
        src = tmp_path / "src"
        src.mkdir()
        write_docs_parquet(src / "d.parquet", docs)
        idx = tmp_path / "idx"
        build_index(str(src / "d.parquet"), idx, doc_id_column="doc_id",
                    num_shards=8, block_size=4)

        local = SearchEngine(idx)
        svc = ShardedQueryService(idx, num_actors=3)
        routed = RoutedSearchEngine(idx, svc)
        try:
            for q in ("alpha beta", "house pizza", "gamma w3", "delta"):
                toks = q.split()
                assert routed.search_and(toks).tolist() == local.search_and(toks).tolist()
                assert routed.search_or(toks).tolist() == local.search_or(toks).tolist()
                assert routed.search_bm25(q, topk=5) == local.search_bm25(q, topk=5)
                assert routed.search_bm25(q, topk=5, method="wand") == local.search_bm25(
                    q, topk=5, method="wand"
                )
            assert routed.search_phrase("house pizza").tolist() == local.search_phrase(
                "house pizza"
            ).tolist()
        finally:
            svc.shutdown()
