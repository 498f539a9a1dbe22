"""Head-term salting (SURVEY.md §4 skew handling): hot terms split across
salt shards must answer every query identically to an unsalted build."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from searchengine_ray.build import IndexManifest, build_index, dump_postings
from searchengine_ray.query import SearchEngine
from searchengine_ray.query.oracle import FullScanOracle
from tests.test_build import write_docs_parquet


def test_salted_build_matches_unsalted(ray_session, tmp_path):
    # "hot" appears in every doc → df=60 > salt_target=20 → 3 salts
    docs = {
        i: f"hot doc{i % 7} filler{i % 3} hot words number{i} hot" for i in range(60)
    }
    d = tmp_path / "c"
    d.mkdir()
    write_docs_parquet(d / "docs.parquet", docs)

    plain = tmp_path / "plain"
    build_index(
        str(d / "docs.parquet"), plain, doc_id_column="doc_id",
        num_shards=8, block_size=4, salt_target_postings=0,
    )
    salty = tmp_path / "salty"
    build_index(
        str(d / "docs.parquet"), salty, doc_id_column="doc_id",
        num_shards=8, block_size=4, salt_target_postings=20, salt_max=8,
    )
    m = IndexManifest.load(salty)
    assert m.salted_terms.get("hot") == 3
    assert IndexManifest.load(plain).salted_terms == {}

    # the hot term's postings really are spread across several shard files
    shards_with_hot = [
        f.name
        for f in sorted((salty / "postings").glob("*.parquet"))
        if "hot" in set(pq.read_table(f, columns=["term"])["term"].to_pylist())
    ]
    assert len(shards_with_hot) == 3

    # structural dump identical
    assert dump_postings(salty) == dump_postings(plain)

    e_plain, e_salty = SearchEngine(plain), SearchEngine(salty)
    oracle = FullScanOracle(docs)
    for q in ("hot", "hot doc1", "filler2 hot", "number7"):
        assert e_salty.search_and(q.split()).tolist() == oracle.search_and(q.split()), q
        assert e_salty.search_or(q.split()).tolist() == oracle.search_or(q.split()), q
        got = e_salty.search_bm25(q, topk=None)
        want = oracle.search_bm25(q, topk=None)
        assert [x for x, _ in got] == [x for x, _ in want], q
        np.testing.assert_allclose([s for _, s in got], [s for _, s in want], rtol=1e-12)
        assert e_salty.search_bm25(q, topk=5, method="wand") == e_salty.search_bm25(
            q, topk=5, method="exhaustive"
        ), q
    assert e_salty.search_phrase("hot words").tolist() == oracle.search_phrase("hot words")
    assert e_salty.doc_frequency("hot") == e_plain.doc_frequency("hot") == 60


def test_estimate_hot_terms_sampled(tmp_path):
    """The distributed salting decision uses a strided file sample
    (build/indexer._estimate_hot_terms): a head term present in a fixed
    fraction of docs must be found with the right n_salts from ~2% of
    files, deterministically, without reading the whole corpus."""
    import pyarrow as pa

    from searchengine_ray.build.indexer import _estimate_hot_terms

    an = tmp_path / "analyzed"
    an.mkdir()
    n_files, rows_per_file = 100, 200
    for f in range(n_files):
        terms = []
        for r in range(n_files * f, n_files * f + rows_per_file):
            row = [f"tail{r % 97}"]  # df ≈ 206 each — never hot
            if r % 2 == 0:
                row.append("hothalf")  # df = N/2
            if r % 5 == 0:
                row.append("hotfifth")  # df = N/5
            terms.append(row)
        pq.write_table(
            pa.table({"terms": pa.array(terms, pa.list_(pa.string()))}),
            an / f"part-{f:05d}.parquet",
        )
    n_docs = n_files * rows_per_file  # 20_000
    got = _estimate_hot_terms(str(an), target=n_docs // 10, salt_max=16, n_docs=n_docs)
    # hothalf: df 10_000 / target 2_000 → 5 salts; hotfifth: 4_000 → 2
    assert got == {"hothalf": 5, "hotfifth": 2}
    # deterministic: same sample, same answer
    assert _estimate_hot_terms(str(an), n_docs // 10, 16, n_docs) == got
    # salt_max caps
    capped = _estimate_hot_terms(str(an), n_docs // 10, 3, n_docs)
    assert capped["hothalf"] == 3
    # nothing hot at a high threshold
    assert _estimate_hot_terms(str(an), n_docs, 16, n_docs) == {}
