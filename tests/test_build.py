"""Index-build tests: structural dump vs a brute-force oracle (reference
test pattern #2, SURVEY.md §5), flush/doc-id goldens (Team18FlushTest),
determinism, resume."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.analysis import default_analyzer
from searchengine_ray.build import IndexManifest, build_index, dump_postings
from searchengine_ray.sources import generate_corpus


def oracle_postings(docs: dict[int, str], analyzer=None) -> dict:
    """Brute-force positional postings: {term: [(doc_id, tf, positions)]}"""
    analyzer = analyzer or default_analyzer()
    out: dict[str, dict[int, list[int]]] = {}
    for doc_id in sorted(docs):
        for pos, term in enumerate(analyzer.analyze(docs[doc_id])):
            out.setdefault(term, {}).setdefault(doc_id, []).append(pos)
    return {
        t: [(d, len(ps), ps) for d, ps in sorted(m.items())] for t, m in out.items()
    }


def write_docs_parquet(path, docs: dict[int, str]):
    ids = sorted(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "url": pa.array([f"https://x/{i}.html" for i in ids], pa.string()),
                "text": pa.array([docs[i] for i in ids], pa.string()),
            }
        ),
        path,
    )


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    docs = {
        0: "cat Dog cat bird. the cat;",
        1: "dog fish! cow cow cow cow",
        2: "bird bird cat? summer pizza house",
        3: "pizza house is closed now, open in summer",
        4: "",
        5: "running runs ran runner",
    }
    write_docs_parquet(d / "docs.parquet", docs)
    return d, docs


class TestBuildStructure:
    def test_postings_match_oracle(self, ray_session, small_corpus, tmp_path):
        corpus, docs = small_corpus
        idx = tmp_path / "idx"
        m = build_index(
            str(corpus / "docs.parquet"), idx,
            doc_id_column="doc_id", num_shards=4, block_size=3,
        )
        assert m.n_docs == 6
        dump = dump_postings(idx)
        oracle = oracle_postings(docs)
        assert set(dump) == set(oracle)
        for term in oracle:
            assert dump[term] == oracle[term], term

    def test_flush_golden_doc_ids(self, ray_session, tmp_path):
        # golden: Team18FlushTest.java:27-56 — docs "kitten, bunny" / "bunny"
        # → postings {stem(kitten):[0], stem(bunny):[0,1]}
        corpus = tmp_path / "c"
        corpus.mkdir()
        docs = {0: "kitten, bunny", 1: "bunny"}
        write_docs_parquet(corpus / "d.parquet", docs)
        idx = tmp_path / "idx"
        build_index(str(corpus / "d.parquet"), idx, doc_id_column="doc_id", num_shards=2)
        dump = dump_postings(idx)
        ana = default_analyzer()
        kitten, bunny = ana.analyze("kitten")[0], ana.analyze("bunny")[0]
        assert [d for d, _, _ in dump[kitten]] == [0]
        assert [d for d, _, _ in dump[bunny]] == [0, 1]

    def test_block_splitting_and_blockmax(self, ray_session, tmp_path):
        corpus = tmp_path / "c"
        corpus.mkdir()
        docs = {i: "spam " * (i + 1) for i in range(10)}  # df=10, tf=i+1
        write_docs_parquet(corpus / "d.parquet", docs)
        idx = tmp_path / "idx"
        build_index(
            str(corpus / "d.parquet"), idx,
            doc_id_column="doc_id", num_shards=1, block_size=4,
        )
        rows = pq.read_table(str(idx / "postings")).to_pylist()
        spam_rows = sorted([r for r in rows if r["term"] == "spam"], key=lambda r: r["block_id"])
        assert [r["block_id"] for r in spam_rows] == [0, 1, 2]
        assert [r["n"] for r in spam_rows] == [4, 4, 2]
        assert all(r["df"] == 10 for r in spam_rows)
        assert spam_rows[0]["block_max_tf"] == 4
        assert spam_rows[2]["block_max_tf"] == 10
        assert spam_rows[0]["doc_id_min"] == 0 and spam_rows[0]["doc_id_max"] == 3
        # block_max_w increases with tf here (same dl growth keeps it monotone)
        ws = [r["block_max_w"] for r in spam_rows]
        assert ws == sorted(ws)

    def test_manifest_stats(self, ray_session, small_corpus, tmp_path):
        corpus, docs = small_corpus
        idx = tmp_path / "idx2"
        m = build_index(str(corpus / "docs.parquet"), idx, doc_id_column="doc_id")
        ana = default_analyzer()
        total = sum(len(ana.analyze(t)) for t in docs.values())
        assert m.total_tokens == total
        assert m.avgdl == pytest.approx(total / len(docs))
        m2 = IndexManifest.load(idx)
        assert m2.n_docs == m.n_docs
        assert m2.phase_complete("analyze") and m2.phase_complete("postings")

    def test_legacy_salted_manifest_refused(self, tmp_path):
        """An index built under the pre-stride salted placement (no
        salt_scheme field) with salted terms must refuse to load —
        probing it with the stride scheme would silently drop postings."""
        import dataclasses
        import json

        m = IndexManifest(salted_terms={"the": 4})
        d = dataclasses.asdict(m)
        del d["salt_scheme"]
        (tmp_path / "manifest.json").write_text(json.dumps(d))
        with pytest.raises(ValueError, match="legacy salted-shard"):
            IndexManifest.load(tmp_path)
        # unsalted legacy manifests are placement-independent: loads fine
        d["salted_terms"] = {}
        (tmp_path / "manifest.json").write_text(json.dumps(d))
        m2 = IndexManifest.load(tmp_path)
        assert m2.salt_scheme == 2

    def test_resume_skips_completed(self, ray_session, small_corpus, tmp_path):
        corpus, _ = small_corpus
        idx = tmp_path / "idx3"
        build_index(str(corpus / "docs.parquet"), idx, doc_id_column="doc_id")
        before = {p.name: p.stat().st_mtime_ns for p in (idx / "postings").glob("*.parquet")}
        m = build_index(str(corpus / "docs.parquet"), idx, doc_id_column="doc_id")
        after = {p.name: p.stat().st_mtime_ns for p in (idx / "postings").glob("*.parquet")}
        assert before == after  # phase checkpoints skipped everything
        assert m.phase_complete("postings")

    def test_docstats_and_docstore(self, ray_session, small_corpus, tmp_path):
        corpus, docs = small_corpus
        idx = tmp_path / "idx4"
        build_index(str(corpus / "docs.parquet"), idx, doc_id_column="doc_id")
        stats = pq.read_table(str(idx / "analyzed"), columns=["doc_id", "dl"]).to_pylist()
        ana = default_analyzer()
        expect = {i: len(ana.analyze(t)) for i, t in docs.items()}
        assert {r["doc_id"]: r["dl"] for r in stats} == expect
        store = pq.read_table(str(idx / "docs")).to_pylist()
        assert {r["doc_id"]: r["text"] for r in store} == docs


class TestBuildOnSyntheticCorpus:
    def test_end_to_end_webpages(self, ray_session, tmp_path):
        corpus = generate_corpus(tmp_path / "web", n_docs=300)
        idx = tmp_path / "webidx"
        m = build_index(
            str(corpus), idx,
            html_column="html", validate_extraction=True,
            doc_id_mode="url_index", num_shards=8,
        )
        assert m.n_docs == 300
        dump = dump_postings(idx)
        # oracle over the corpus texts
        tbl = pq.read_table(str(corpus), columns=["url", "text"])
        docs = {
            int(u.rsplit("/", 1)[1].split(".")[0]): t
            for u, t in zip(tbl["url"].to_pylist(), tbl["text"].to_pylist())
        }
        oracle = oracle_postings(docs)
        assert set(dump) == set(oracle)
        for term in list(oracle):
            assert dump[term] == oracle[term], term


class TestSmallInputFastPath:
    """The size-gated in-process reduce (stats read, docs write, postings
    reduce) must produce byte-identical indexes to the distributed path."""

    def test_paths_identical(self, ray_session, tmp_path, monkeypatch):
        from searchengine_ray.build import indexer as IX
        from searchengine_ray.build import dump_postings

        docs = {i: f"alpha beta w{i % 7} gamma{i % 3} delta" for i in range(200)}
        src = tmp_path / "src"
        src.mkdir()
        write_docs_parquet(src / "d.parquet", docs)
        kw = dict(doc_id_column="doc_id", num_shards=4, block_size=8)

        IX.build_index(str(src / "d.parquet"), tmp_path / "small", **kw)
        monkeypatch.setattr(IX, "_SMALL_INPUT_BYTES", 0)  # force Ray path
        IX.build_index(str(src / "d.parquet"), tmp_path / "dist", **kw)

        assert dump_postings(tmp_path / "small") == dump_postings(tmp_path / "dist")
        m_s = IX.IndexManifest.load(tmp_path / "small")
        m_d = IX.IndexManifest.load(tmp_path / "dist")
        assert (m_s.n_docs, m_s.total_tokens, m_s.avgdl) == (
            m_d.n_docs, m_d.total_tokens, m_d.avgdl
        )


class TestEncodedPartials:
    """explode_partials(encode=True) — the wire-compressed shuffle schema —
    must reduce to identical posting blocks as the list-typed partials."""

    def test_encoded_partials_identical_blocks(self):
        import pyarrow.compute as pc

        from searchengine_ray.analysis import default_analyzer
        from searchengine_ray.stages.postings import (
            build_shard_blocks,
            explode_partials,
        )

        an = default_analyzer()
        rows = {"doc_id": [], "dl": [], "terms": [], "tfs": [], "positions": []}
        for i in range(300):
            toks = an.analyze(f"alpha beta w{i % 9} gamma{i % 4} beta delta e{i}")
            seen: dict[str, list[int]] = {}
            for p, t in enumerate(toks):
                seen.setdefault(t, []).append(p)
            rows["doc_id"].append(i)
            rows["dl"].append(len(toks))
            rows["terms"].append(list(seen))
            rows["tfs"].append([len(v) for v in seen.values()])
            rows["positions"].append(list(seen.values()))
        tbl = pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.uint64()),
                "dl": pa.array(rows["dl"], pa.int32()),
                "terms": pa.array(rows["terms"], pa.list_(pa.string())),
                "tfs": pa.array(rows["tfs"], pa.list_(pa.int32())),
                "positions": pa.array(rows["positions"], pa.list_(pa.list_(pa.int32()))),
            }
        )
        salted = {"beta": 2}  # head term through the salt re-shard path
        kw = dict(block_size=16, avgdl=7.0, k1=1.2, b=0.75, positional=True)
        for positional in (True, False):
            kw["positional"] = positional
            plain_parts, enc_parts = [], []
            for off in range(0, tbl.num_rows, 128):
                s = tbl.slice(off, 128)
                plain_parts.append(explode_partials(s, 4, positional, salted))
                enc_parts.append(
                    explode_partials(s, 4, positional, salted, encode=True)
                )
            plain = pa.concat_tables(plain_parts)
            enc = pa.concat_tables(enc_parts)
            assert enc.nbytes < plain.nbytes  # the point: fewer wire bytes
            for sh in range(4):
                g1 = plain.filter(pc.equal(plain["shard"], sh)).combine_chunks()
                g2 = enc.filter(pc.equal(enc["shard"], sh)).combine_chunks()
                assert build_shard_blocks(g1, **kw).equals(
                    build_shard_blocks(g2, **kw)
                ), f"shard {sh} positional={positional}"

    def test_encoded_empty_batch(self):
        from searchengine_ray.stages.postings import explode_partials

        empty = pa.table(
            {
                "doc_id": pa.array([], pa.uint64()),
                "dl": pa.array([], pa.int32()),
                "terms": pa.array([], pa.list_(pa.string())),
                "tfs": pa.array([], pa.list_(pa.int32())),
                "positions": pa.array([], pa.list_(pa.list_(pa.int32()))),
            }
        )
        out = explode_partials(empty, 4, True, None, encode=True)
        assert out.num_rows == 0
        assert "n" in out.column_names

    def test_encoded_partials_nonmonotonic_doc_ids(self):
        """A Ray block can span input-file fragments, so batch doc ids are
        not globally ascending — the wire delta chains must still encode
        (regression: ValueError 'varbyte requires non-negative values')."""
        import pyarrow.compute as pc

        from searchengine_ray.stages.postings import (
            build_shard_blocks,
            explode_partials,
        )

        ids = [5372, 5373, 6111, 1112, 9, 77]  # out of order, like a
        tbl = pa.table(                        # block mixing two files
            {
                "doc_id": pa.array(ids, pa.uint64()),
                "dl": pa.array([3] * 6, pa.int32()),
                "terms": pa.array([["a", "b", "c"]] * 6, pa.list_(pa.string())),
                "tfs": pa.array([[1, 1, 1]] * 6, pa.list_(pa.int32())),
                "positions": pa.array(
                    [[[0], [1], [2]]] * 6, pa.list_(pa.list_(pa.int32()))
                ),
            }
        )
        kw = dict(block_size=4, avgdl=3.0, k1=1.2, b=0.75, positional=True)
        plain = explode_partials(tbl, 2, True)
        enc = explode_partials(tbl, 2, True, encode=True)
        for sh in range(2):
            g1 = plain.filter(pc.equal(plain["shard"], sh)).combine_chunks()
            g2 = enc.filter(pc.equal(enc["shard"], sh)).combine_chunks()
            assert build_shard_blocks(g1, **kw).equals(build_shard_blocks(g2, **kw))
