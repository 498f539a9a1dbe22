"""Incremental-generation + compaction tests: an index grown by
``build_increment`` must answer every query identically to a full rebuild
over the union corpus (the reference's merge-correctness invariant,
``Team12MergeTest`` pattern), and ``compact`` must preserve results while
physically dropping tombstones."""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_ray.build import build_index, dump_postings
from searchengine_ray.build.merge import attach_generation, build_increment, compact
from searchengine_ray.query import SearchEngine
from tests.test_build import write_docs_parquet

DOCS_A = {
    0: "cat dog toy", 1: "cat Dog dog", 2: "toy pig cat",
    3: "dog pig toy house", 4: "cat cat cat",
}
DOCS_B = {
    5: "pig is not a toy dog", 6: "Summer Pizza House is closed in winter",
    7: "pizza in summer pizza house is great", 8: "the summer house has pizza and dogs",
}
ALL_DOCS = {**DOCS_A, **DOCS_B}

QUERIES = ["cat", "dog toy", "pizza summer", "house", "pig cat dog"]


@pytest.fixture()
def grown_index(ray_session, tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    write_docs_parquet(a / "d.parquet", DOCS_A)
    write_docs_parquet(b / "d.parquet", DOCS_B)
    idx = tmp_path / "idx"
    build_index(str(a / "d.parquet"), idx, doc_id_column="doc_id", num_shards=4, block_size=3)
    build_increment(
        str(b / "d.parquet"), idx, tmp_path / "delta", doc_id_column="doc_id"
    )
    full = tmp_path / "full"
    allp = tmp_path / "all"
    allp.mkdir()
    write_docs_parquet(allp / "d.parquet", ALL_DOCS)
    build_index(str(allp / "d.parquet"), full, doc_id_column="doc_id", num_shards=4, block_size=3)
    return idx, full


def assert_same_results(eng_a: SearchEngine, eng_b: SearchEngine):
    for q in QUERIES:
        assert eng_a.search_and(q.split()).tolist() == eng_b.search_and(q.split()).tolist(), q
        assert eng_a.search_or(q.split()).tolist() == eng_b.search_or(q.split()).tolist(), q
        got, want = eng_a.search_bm25(q, topk=None), eng_b.search_bm25(q, topk=None)
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_allclose([s for _, s in got], [s for _, s in want], rtol=1e-12)
        gw = eng_a.search_bm25(q, topk=3, method="wand")
        assert gw == eng_a.search_bm25(q, topk=3, method="exhaustive"), q
    for ph in ("pizza house", "cat dog", "dog toy"):
        assert eng_a.search_phrase(ph).tolist() == eng_b.search_phrase(ph).tolist(), ph
    t_a = eng_a.search_tfidf(["pizza", "house"], None)
    t_b = eng_b.search_tfidf(["pizza", "house"], None)
    assert [d for d, _ in t_a] == [d for d, _ in t_b]
    np.testing.assert_allclose([s for _, s in t_a], [s for _, s in t_b], rtol=1e-12)


class TestIncrement:
    def test_generation_attached(self, grown_index):
        idx, _ = grown_index
        eng = SearchEngine(idx)
        assert eng.manifest.generations == ["postings", "gen-1"]
        assert eng.num_docs() == len(ALL_DOCS)

    def test_grown_equals_full_rebuild(self, grown_index):
        idx, full = grown_index
        assert_same_results(SearchEngine(idx), SearchEngine(full))

    def test_mismatched_params_rejected(self, ray_session, tmp_path):
        a = tmp_path / "a"
        a.mkdir()
        write_docs_parquet(a / "d.parquet", DOCS_A)
        main = tmp_path / "m"
        delta = tmp_path / "d2"
        build_index(str(a / "d.parquet"), main, doc_id_column="doc_id", num_shards=4)
        build_index(str(a / "d.parquet"), delta, doc_id_column="doc_id", num_shards=8)
        with pytest.raises(ValueError, match="parameters"):
            attach_generation(main, delta)


class TestCompact:
    def test_compact_preserves_results(self, grown_index):
        idx, full = grown_index
        before = dump_postings(idx, "postings")
        m = compact(idx)
        assert m.generations == ["postings"]
        assert_same_results(SearchEngine(idx), SearchEngine(full))
        # structural: merged dump equals full-rebuild dump
        assert dump_postings(idx) == dump_postings(full)

    def test_compact_interleaved_doc_ids_dirty_path(self, ray_session, tmp_path):
        # doc ids derive from data (url hashes at scale), so generations
        # can INTERLEAVE in id space — every term's block ranges then
        # overlap across generations and the selective compactor must
        # take the decode→re-encode path, not the carry path. Identity
        # vs a full rebuild is the contract either way.
        even = {i: t for i, t in enumerate(
            ["cat dog toy", "toy pig cat", "cat cat cat",
             "pizza in summer", "dog pig toy house"]) }
        evens = {2 * k: v for k, v in even.items()}           # 0,2,4,6,8
        odds = {2 * k + 1: v + " pizza house" for k, v in even.items()}  # 1,3,..
        a, b, allp = tmp_path / "a", tmp_path / "b", tmp_path / "all"
        for d in (a, b, allp):
            d.mkdir()
        write_docs_parquet(a / "d.parquet", evens)
        write_docs_parquet(b / "d.parquet", odds)
        write_docs_parquet(allp / "d.parquet", {**evens, **odds})
        idx, full = tmp_path / "idx", tmp_path / "full"
        build_index(str(a / "d.parquet"), idx, doc_id_column="doc_id",
                    num_shards=4, block_size=3)
        build_increment(str(b / "d.parquet"), idx, tmp_path / "delta",
                        doc_id_column="doc_id")
        build_index(str(allp / "d.parquet"), full, doc_id_column="doc_id",
                    num_shards=4, block_size=3)
        compact(idx)
        assert_same_results(SearchEngine(idx), SearchEngine(full))
        assert dump_postings(idx) == dump_postings(full)

    def test_compact_mixed_clean_dirty_with_tombstones(self, ray_session, tmp_path):
        # disjoint id ranges (carry path eligible) but tombstones hit a
        # few terms: those terms must re-encode, the rest carry — and
        # the result must equal a scratch build of the live docs
        base = {i: t for i, t in enumerate(
            ["cat dog toy", "cat Dog dog", "toy pig cat",
             "dog pig toy house", "cat cat cat"])}
        delta = {10 + i: t for i, t in enumerate(
            ["pig is not a toy dog", "Summer Pizza House is closed",
             "pizza in summer pizza house", "the summer house has pizza"])}
        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(), b.mkdir()
        write_docs_parquet(a / "d.parquet", base)
        write_docs_parquet(b / "d.parquet", delta)
        idx = tmp_path / "idx"
        build_index(str(a / "d.parquet"), idx, doc_id_column="doc_id",
                    num_shards=4, block_size=3)
        build_increment(str(b / "d.parquet"), idx, tmp_path / "delta",
                        doc_id_column="doc_id")
        eng = SearchEngine(idx)
        eng.delete_by_keyword("pig")  # docs 2, 3, 10
        compact(idx)
        live = {d: t for d, t in {**base, **delta}.items() if d not in (2, 3, 10)}
        allp = tmp_path / "all"
        allp.mkdir()
        write_docs_parquet(allp / "d.parquet", live)
        full = tmp_path / "full"
        build_index(str(allp / "d.parquet"), full, doc_id_column="doc_id",
                    num_shards=4, block_size=3)
        assert_same_results(SearchEngine(idx), SearchEngine(full))
        assert dump_postings(idx) == dump_postings(full)

    def test_compact_fuzz_random_generations_and_deletes(self, ray_session, tmp_path):
        # seeded fuzz over the selective compactor's decision surface:
        # random id layouts (sequential / interleaved / sparse), random
        # generation splits, random delete sets — every scenario must
        # byte-match a scratch build of the live docs
        import numpy as np

        rng = np.random.default_rng(7)
        vocab = ["cat", "dog", "toy", "pig", "house", "pizza", "summer",
                 "winter", "scan", "merge", "query", "fast"]
        for case in range(4):
            n = int(rng.integers(12, 30))
            if case % 2:
                ids = rng.choice(10_000, size=n, replace=False).astype(int)
            else:
                ids = np.arange(n)
            docs = {
                int(i): " ".join(rng.choice(vocab, size=rng.integers(3, 9)))
                for i in ids
            }
            items = list(docs.items())
            rng.shuffle(items)
            cut = int(rng.integers(3, len(items) - 3))
            gen_a, gen_b = dict(items[:cut]), dict(items[cut:])
            del_kw = str(rng.choice(vocab))

            base = tmp_path / f"case{case}"
            base.mkdir()
            a, b, allp = base / "a", base / "b", base / "all"
            for d in (a, b, allp):
                d.mkdir()
            write_docs_parquet(a / "d.parquet", gen_a)
            write_docs_parquet(b / "d.parquet", gen_b)
            idx = base / "idx"
            build_index(str(a / "d.parquet"), idx, doc_id_column="doc_id",
                        num_shards=4, block_size=3)
            build_increment(str(b / "d.parquet"), idx, base / "delta",
                            doc_id_column="doc_id")
            eng = SearchEngine(idx)
            deleted = set(eng.search_keyword(del_kw).tolist())
            eng.delete_by_keyword(del_kw)
            compact(idx)

            live = {d: t for d, t in docs.items() if d not in deleted}
            write_docs_parquet(allp / "d.parquet", live)
            full = base / "full"
            build_index(str(allp / "d.parquet"), full, doc_id_column="doc_id",
                        num_shards=4, block_size=3)
            assert dump_postings(idx) == dump_postings(full), (case, del_kw)

    def test_compact_drops_tombstones(self, grown_index):
        idx, _ = grown_index
        eng = SearchEngine(idx)
        eng.delete_by_keyword("pig")  # docs 2, 3, 5
        m = compact(idx)
        assert m.tombstones == []
        eng2 = SearchEngine(idx)
        assert eng2.search_keyword("pig").tolist() == []
        assert eng2.num_docs() == len(ALL_DOCS) - 3
        dump = dump_postings(idx)
        for term, posts in dump.items():
            assert all(d not in (2, 3, 5) for d, _, _ in posts), term
        # BM25 stats reflect the shrunken corpus (N, avgdl recomputed)
        from searchengine_ray.query.oracle import FullScanOracle

        live = {d: t for d, t in ALL_DOCS.items() if d not in (2, 3, 5)}
        oracle = FullScanOracle(live)
        for q in ("cat", "toy house", "pizza"):
            got = eng2.search_bm25(q, topk=None)
            want = oracle.search_bm25(q, topk=None)
            assert [d for d, _ in got] == [d for d, _ in want], q
            np.testing.assert_allclose([s for _, s in got], [s for _, s in want], rtol=1e-12)


class TestAvgdlDrift:
    """ADVICE r1 (high): stored block maxima were encoded with a
    generation's build-time avgdl; after an attach raises the manifest
    avgdl, WAND must rescale bounds or it prunes true top scorers."""

    @pytest.fixture()
    def drifted_index(self, ray_session, tmp_path):
        # main: 30 short docs (avgdl ~3), "cat" at varying tf
        main_docs = {
            i: ("cat " * (1 + i % 4)) + f"fill{i}a fill{i}b" for i in range(30)
        }
        # delta: 10 long docs (60 unique tokens each) WITHOUT "cat", so the
        # term stays single-generation (the lazy fast path) while avgdl ~6x
        delta_docs = {
            1000 + j: " ".join(f"lw{j}x{k}" for k in range(60)) for j in range(10)
        }
        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(), b.mkdir()
        write_docs_parquet(a / "d.parquet", main_docs)
        write_docs_parquet(b / "d.parquet", delta_docs)
        idx = tmp_path / "idx"
        build_index(
            str(a / "d.parquet"), idx, doc_id_column="doc_id",
            num_shards=2, block_size=3,
        )
        build_increment(str(b / "d.parquet"), idx, tmp_path / "delta", doc_id_column="doc_id")
        return idx, {**main_docs, **delta_docs}

    def test_wand_exact_under_drift(self, drifted_index):
        from searchengine_ray.query.oracle import FullScanOracle

        idx, union = drifted_index
        eng = SearchEngine(idx)
        built = eng.manifest.phases["postings"]["built_avgdl"]
        assert eng.manifest.avgdl > 2 * built  # the drift is real
        oracle = FullScanOracle(union)
        for topk in (1, 2, 3, 5, 10):
            ex = eng.search_bm25("cat", topk=topk, method="exhaustive")
            wd = eng.search_bm25("cat", topk=topk, method="wand")
            assert wd == ex, topk
            want = oracle.search_bm25("cat", topk=topk)
            assert [d for d, _ in wd] == [d for d, _ in want], topk
            np.testing.assert_allclose(
                [s for _, s in wd], [s for _, s in want], rtol=1e-12
            )

    def test_compact_resets_built_avgdl(self, drifted_index):
        idx, _ = drifted_index
        m = compact(idx)
        assert m.phases["postings"]["built_avgdl"] == pytest.approx(m.avgdl)


class TestAttachValidation:
    def test_attach_rejects_overlapping_doc_ids(self, ray_session, tmp_path):
        a = tmp_path / "a"
        a.mkdir()
        write_docs_parquet(a / "d.parquet", DOCS_A)
        main, delta = tmp_path / "m", tmp_path / "d2"
        build_index(str(a / "d.parquet"), main, doc_id_column="doc_id", num_shards=4)
        build_index(str(a / "d.parquet"), delta, doc_id_column="doc_id", num_shards=4)
        with pytest.raises(ValueError, match="disjoint"):
            attach_generation(main, delta)

    def test_mismatched_codec_rejected(self, ray_session, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(), b.mkdir()
        write_docs_parquet(a / "d.parquet", DOCS_A)
        write_docs_parquet(b / "d.parquet", DOCS_B)
        main, delta = tmp_path / "m", tmp_path / "d2"
        build_index(str(a / "d.parquet"), main, doc_id_column="doc_id",
                    num_shards=4, codec="naive")
        build_index(str(b / "d.parquet"), delta, doc_id_column="doc_id",
                    num_shards=4, codec="delta_varbyte")
        with pytest.raises(ValueError, match="parameters"):
            attach_generation(main, delta)

    def test_increment_inherits_codec(self, ray_session, tmp_path):
        """build_increment must default codec/k1/b from the main manifest
        (ADVICE r1: a naive-codec index grown incrementally silently got a
        delta_varbyte delta before)."""
        a, b, allp = tmp_path / "a", tmp_path / "b", tmp_path / "all"
        a.mkdir(), b.mkdir(), allp.mkdir()
        write_docs_parquet(a / "d.parquet", DOCS_A)
        write_docs_parquet(b / "d.parquet", DOCS_B)
        write_docs_parquet(allp / "d.parquet", ALL_DOCS)
        idx, full = tmp_path / "idx", tmp_path / "full"
        build_index(str(a / "d.parquet"), idx, doc_id_column="doc_id",
                    num_shards=4, block_size=3, codec="naive", bm25_k1=1.6)
        build_increment(str(b / "d.parquet"), idx, tmp_path / "delta",
                        doc_id_column="doc_id")
        build_index(str(allp / "d.parquet"), full, doc_id_column="doc_id",
                    num_shards=4, block_size=3, codec="naive", bm25_k1=1.6)
        assert_same_results(SearchEngine(idx), SearchEngine(full))
