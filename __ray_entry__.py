"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl→index→query pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (plus the training-data extras); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible entry.

Ray is initialised by the driver BEFORE this module is imported — nothing
here (or in ``searchengine_ray``) calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build a positional
    BM25 index over the ``documents`` table (analyze actor pool →
    postings shuffle → block-max shards), then answer a mixed batch of
    BM25 / boolean / phrase queries through the actor-pool query stage.
    Returns the result rows (qid, rank, doc_id, score)."""
    import pyarrow as pa
    import ray.data as rd

    from searchengine_ray.pipelines.queries import documents_index
    from searchengine_ray.query import QueryEngineStage

    sf_dir = "/root/testdata/sf0.001"
    idx = documents_index(sf_dir, "punct_porter")

    queries_tbl = pa.table(
        {
            "qid": pa.array(range(6), pa.int64()),
            "query": pa.array(
                [
                    "window merge query",
                    "join small table",
                    "fast scan",
                    "hash value part",
                    "stream batch data",
                    "sort order line",
                ]
            ),
        }
    )
    results = rd.from_arrow(queries_tbl).map_batches(
        QueryEngineStage,
        fn_constructor_kwargs=dict(index_dir=str(idx), kind="bm25", topk=5),
        batch_format="pyarrow",
        batch_size=3,
        concurrency=2,
    )
    return results.to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from searchengine_ray.pipelines.queries import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from searchengine_ray.pipelines.queries import registry

    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
