"""Legacy corpus-convention parser (M9) + a scaled-down stress tier
mirroring the reference's budgeted stress tests (SURVEY.md §5 pattern 5)."""

from __future__ import annotations

import time

import pyarrow as pa

from searchengine_ray.sources.legacy import (
    parse_legacy_batch,
    parse_legacy_doc,
    to_legacy_text,
)


class TestLegacyConvention:
    def test_roundtrip(self):
        text = to_legacy_text(42, "https://www.ics.uci.edu/x", "page body\nwith lines")
        doc_id, url, body = parse_legacy_doc(text)
        assert (doc_id, url, body) == (42, "https://www.ics.uci.edu/x", "page body\nwith lines")

    def test_batch_kernel(self):
        batch = pa.table(
            {"text": [to_legacy_text(i, f"https://e/{i}", f"body {i}") for i in range(5)]}
        )
        out = parse_legacy_batch(batch)
        assert out["doc_id"].to_pylist() == list(range(5))
        assert out["url"][3].as_py() == "https://e/3"
        assert out["text"][4].as_py() == "body 4"

    def test_legacy_corpus_indexes(self, ray_session, tmp_path):
        # legacy-format corpus → parse stage → normal build pipeline
        import pyarrow.parquet as pq
        import ray.data as rd

        from searchengine_ray.build import build_index
        from searchengine_ray.query import SearchEngine

        docs = {i: f"searchable words number{i}" for i in range(20)}
        legacy = pa.table(
            {"text": [to_legacy_text(i, f"https://e/{i}", t) for i, t in docs.items()]}
        )
        raw = tmp_path / "legacy.parquet"
        pq.write_table(legacy, raw)
        parsed_dir = tmp_path / "parsed"
        rd.read_parquet(str(raw)).map_batches(
            parse_legacy_batch, batch_format="pyarrow"
        ).write_parquet(str(parsed_dir))
        idx = tmp_path / "idx"
        build_index(str(parsed_dir), idx, doc_id_column="doc_id", num_shards=2)
        eng = SearchEngine(idx)
        assert eng.search_keyword("searchable").tolist() == list(range(20))


class TestStressTier:
    """Scaled-down analogue of the reference stress tests
    (Team2/Team3StressTest: ≥167 docs/s floor with boolean searches).
    Kept small so CI stays fast; bench.py carries the real numbers."""

    def test_indexing_and_search_budget(self, ray_session, tmp_path):
        from searchengine_ray.build import build_index
        from searchengine_ray.query import SearchEngine
        from searchengine_ray.sources import generate_corpus

        n = 2000
        corpus = generate_corpus(tmp_path / "web", n_docs=n)
        t0 = time.perf_counter()
        m = build_index(
            str(corpus), tmp_path / "idx",
            html_column="html", doc_id_mode="url_index", num_shards=8,
        )
        eng = SearchEngine(tmp_path / "idx")
        for q in ("search engine", "pizza summer", "wiki", "mountain river"):
            eng.search_and(q.split())
            eng.search_or(q.split())
            eng.search_bm25(q, topk=10)
        elapsed = time.perf_counter() - t0
        assert m.n_docs == n
        # reference floor is 167 docs/s on a workstation; require a loose
        # floor here to catch order-of-magnitude regressions despite the
        # sandbox's CPU-steal noise
        assert n / elapsed > 50, f"indexing too slow: {n / elapsed:.0f} docs/s"
