"""Pluggable posting codec at the index level (§2.10 extension surface):
naive-codec index answers identically; delta+varbyte index is < 2/3 the
size of the naive one (Team6IndexCompressionTest invariant)."""

from __future__ import annotations

from pathlib import Path

from searchengine_ray.build import build_index, dump_postings
from searchengine_ray.query import SearchEngine
from tests.test_build import write_docs_parquet
from tests.test_query import DOCS


def _index_bytes(idx: Path) -> int:
    return sum(f.stat().st_size for f in (idx / "postings").glob("*.parquet"))


def test_naive_codec_roundtrip_and_ratio(ray_session, tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    # repeat docs to get long posting lists (compression actually matters)
    docs = {i: DOCS[i % len(DOCS)] for i in range(200)}
    write_docs_parquet(d / "docs.parquet", docs)
    vb, nv = tmp_path / "vb", tmp_path / "nv"
    build_index(str(d / "docs.parquet"), vb, doc_id_column="doc_id", num_shards=2)
    build_index(
        str(d / "docs.parquet"), nv, doc_id_column="doc_id", num_shards=2, codec="naive"
    )
    assert dump_postings(vb) == dump_postings(nv)
    e1, e2 = SearchEngine(vb), SearchEngine(nv)
    for q in ("cat dog", "summer pizza house", "toy"):
        assert e1.search_bm25(q, topk=5) == e2.search_bm25(q, topk=5)
        assert e1.search_phrase(q).tolist() == e2.search_phrase(q).tolist()
    # Team6IndexCompressionTest.java:103 — compressed < 2/3 of uncompressed
    assert _index_bytes(vb) < (2 / 3) * _index_bytes(nv)
