"""Query-engine tests: boolean/phrase semantics, deletion tombstones,
TF-IDF + BM25 rank- and score-identity vs the full-scan oracle, and
WAND == exhaustive equivalence (reference test patterns #3/#4, SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_ray.build import build_index
from searchengine_ray.query.engine import SearchEngine
from searchengine_ray.query.oracle import FullScanOracle
from searchengine_ray.sources import generate_corpus
from tests.test_build import write_docs_parquet

DOCS = {
    0: "cat dog toy",
    1: "cat Dog dog",
    2: "toy pig cat",
    3: "dog pig toy house",
    4: "cat cat cat",
    5: "pig is not a toy dog",
    6: "Summer Pizza House is closed in winter",
    7: "pizza in summer pizza house is great",
    8: "the summer house has pizza and dogs",
}


@pytest.fixture(scope="module")
def engine(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("qcorpus")
    write_docs_parquet(d / "docs.parquet", DOCS)
    idx = tmp_path_factory.mktemp("qindex")
    build_index(
        str(d / "docs.parquet"), idx, doc_id_column="doc_id",
        num_shards=4, block_size=2,
    )
    return SearchEngine(idx)


@pytest.fixture(scope="module")
def oracle():
    return FullScanOracle(DOCS)


class TestBoolean:
    def test_keyword(self, engine, oracle):
        for kw in ("cat", "dog", "pizza", "zebra", "toy"):
            assert engine.search_keyword(kw).tolist() == oracle.search_and([kw]), kw

    def test_and(self, engine, oracle):
        for q in (["cat", "dog"], ["dog", "toy"], ["cat", "zebra"], ["summer", "pizza"]):
            assert engine.search_and(q).tolist() == oracle.search_and(q), q

    def test_or(self, engine, oracle):
        for q in (["cat", "pig"], ["zebra", "pizza"], ["zebra"], ["cat", "dog", "toy"]):
            assert engine.search_or(q).tolist() == oracle.search_or(q), q

    def test_duplicate_keywords_dedup(self, engine, oracle):
        assert engine.search_and(["cat", "cat"]).tolist() == oracle.search_and(["cat"])

    def test_stopword_only_query_empty(self, engine):
        assert engine.search_and(["the", "is"]).tolist() == []
        assert engine.search_or(["the"]).tolist() == []

    def test_case_insensitive(self, engine, oracle):
        assert engine.search_and(["CAT"]).tolist() == oracle.search_and(["cat"])


class TestPhrase:
    # mirrors Team11PhraseSearchTest's "Summer Pizza House" pattern
    def test_phrase_hits(self, engine, oracle):
        for phrase in ("summer pizza house", "pizza house", "cat dog", "dog toy"):
            assert engine.search_phrase(phrase).tolist() == oracle.search_phrase(phrase), phrase

    def test_phrase_crossing_stopwords(self, engine, oracle):
        # analysis removes stopwords, so "pizza and dogs" → [pizza, dog] adjacency
        phrase = "pizza and dogs"
        assert engine.search_phrase(phrase).tolist() == oracle.search_phrase(phrase)

    def test_absent_phrase(self, engine, oracle):
        assert engine.search_phrase("pizza cat").tolist() == []

    def test_single_token_phrase(self, engine, oracle):
        assert engine.search_phrase("pizza").tolist() == oracle.search_phrase("pizza")


class TestTfIdf:
    @pytest.mark.parametrize(
        "query,topk",
        [
            (["cat"], 3), (["cat", "dog"], 5), (["pizza", "house"], None),
            (["summer", "pizza", "house"], 4), (["zebra"], 5),
            (["cat", "cat", "dog"], None), (["toy"], 0),
        ],
    )
    def test_rank_and_score_identity(self, engine, oracle, query, topk):
        got = engine.search_tfidf(query, topk)
        want = oracle.search_tfidf(query, topk)
        assert [d for d, _ in got] == [d for d, _ in want]
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=0, atol=0
        )


class TestBM25:
    QUERIES = [
        "cat", "cat dog", "summer pizza house", "pig toy", "dog house",
        "zebra", "cat cat dog", "the cat",
    ]

    @pytest.mark.parametrize("query", QUERIES)
    def test_exhaustive_matches_oracle(self, engine, oracle, query):
        got = engine.search_bm25(query, topk=None)
        want = oracle.search_bm25(query, topk=None)
        assert [d for d, _ in got] == [d for d, _ in want]
        np.testing.assert_allclose([s for _, s in got], [s for _, s in want], rtol=0, atol=0)

    @pytest.mark.parametrize("query", QUERIES)
    @pytest.mark.parametrize("topk", [1, 3, 10])
    def test_wand_equals_exhaustive(self, engine, query, topk):
        wand = engine.search_bm25(query, topk=topk, method="wand")
        ex = engine.search_bm25(query, topk=topk, method="exhaustive")
        assert wand == ex

    @pytest.mark.parametrize("query", QUERIES)
    @pytest.mark.parametrize("topk", [1, 3, 10])
    def test_maxscore_equals_exhaustive(self, engine, query, topk):
        ms = engine.search_bm25(query, topk=topk, method="maxscore")
        ex = engine.search_bm25(query, topk=topk, method="exhaustive")
        assert ms == ex

    @pytest.mark.parametrize("query", QUERIES)
    def test_auto_equals_exhaustive(self, engine, query):
        assert engine.search_bm25(query, topk=5, method="auto") == engine.search_bm25(
            query, topk=5, method="exhaustive"
        )

    def test_topk_zero(self, engine):
        assert engine.search_bm25("cat", topk=0) == []


class TestDeletion:
    def test_delete_by_keyword(self, ray_session, tmp_path):
        # mirrors InvertedIndexDeletionTest cat/dog/pig semantics
        d = tmp_path / "c"
        d.mkdir()
        write_docs_parquet(d / "docs.parquet", DOCS)
        idx = tmp_path / "idx"
        build_index(str(d / "docs.parquet"), idx, doc_id_column="doc_id", num_shards=2)
        eng = SearchEngine(idx)
        n = eng.delete_by_keyword("pig")
        assert n == 3  # docs 2, 3, 5
        assert eng.search_keyword("pig").tolist() == []
        assert eng.search_keyword("toy").tolist() == [0]
        assert eng.search_or(["cat", "pig"]).tolist() == [0, 1, 4]
        # ranked searches exclude tombstones too
        assert all(d not in (2, 3, 5) for d, _ in eng.search_bm25("toy pig", topk=None))
        # reload persists tombstones
        eng2 = SearchEngine(idx)
        assert eng2.search_keyword("pig").tolist() == []

    def test_fetch_docs(self, engine):
        got = engine.fetch_docs([0, 6])
        assert got == {0: DOCS[0], 6: DOCS[6]}


class TestLargerCorpusIdentity:
    def test_synthetic_corpus_rank_identity(self, ray_session, tmp_path):
        corpus = generate_corpus(tmp_path / "web", n_docs=400)
        idx = tmp_path / "idx"
        build_index(
            str(corpus), idx, html_column="html", doc_id_mode="url_index",
            num_shards=8, block_size=32,
        )
        eng = SearchEngine(idx)
        import pyarrow.parquet as pq

        tbl = pq.read_table(str(corpus), columns=["url", "text"])
        docs = {
            int(u.rsplit("/", 1)[1].split(".")[0]): t
            for u, t in zip(tbl["url"].to_pylist(), tbl["text"].to_pylist())
        }
        oracle = FullScanOracle(docs)
        queries = [
            "search engine", "wiki", "pizza summer", "token stems",
            "crawling the web pages", "bright green garden", "zebra missing",
        ]
        for q in queries:
            got = eng.search_bm25(q, topk=10)
            want = oracle.search_bm25(q, topk=10)
            assert got == [(d, pytest.approx(s, rel=0, abs=0)) for d, s in want], q
            gt = eng.search_tfidf(q.split(), 10)
            wt = oracle.search_tfidf(q.split(), 10)
            assert [d for d, _ in gt] == [d for d, _ in wt], q
            np.testing.assert_allclose([s for _, s in gt], [s for _, s in wt], rtol=0, atol=0)
            assert eng.search_and(q.split()).tolist() == oracle.search_and(q.split()), q
            assert eng.search_or(q.split()).tolist() == oracle.search_or(q.split()), q


def test_concurrent_queries_thread_safe(engine):
    """The shard loader uses a thread pool + locked LRU; hammering one
    engine from several threads must give identical results to serial
    (and a freshly-constructed engine, i.e. cold caches each time)."""
    from concurrent.futures import ThreadPoolExecutor

    queries = ["cat dog", "summer pizza house", "pig toy", "dog", "pizza winter"]
    serial = [engine.search_bm25(q, topk=5) for q in queries]
    with ThreadPoolExecutor(max_workers=8) as pool:
        for _ in range(10):
            got = list(pool.map(lambda q: engine.search_bm25(q, topk=5), queries))
            assert got == serial


class TestNearSearch:
    def test_slop_semantics(self, engine):
        # DOCS[6] = "Summer Pizza House is closed in winter":
        # analyzed (stopwords dropped): summer pizza house closed winter
        # summer..closed distance 3; summer..winter distance 4
        assert engine.search_near("summer", "closed", slop=3).tolist() == [6]
        assert engine.search_near("summer", "winter", slop=3).tolist() == []
        assert engine.search_near("summer", "winter", slop=4).tolist() == [6]

    def test_multiple_docs_and_order(self, engine):
        got = engine.search_near("pizza", "house", slop=2)
        assert got.tolist() == sorted(got.tolist())
        assert set(got.tolist()) == {6, 7, 8}

    def test_missing_term(self, engine):
        assert engine.search_near("zebra", "pizza", slop=5).tolist() == []
        assert engine.search_near("zebra", "zebra", slop=5).tolist() == []


class TestBooleanParser:
    """query/boolparse.py: grammar, precedence, set semantics."""

    def _ids(self, engine, q):
        from searchengine_ray.query.boolparse import search_boolean

        return sorted(search_boolean(engine, q).tolist())

    def test_implicit_and(self, engine):
        assert self._ids(engine, "cat dog") == self._ids(engine, "cat AND dog")

    def test_or_precedence(self, engine):
        # AND binds tighter: "cat dog OR pig" == (cat AND dog) OR pig
        want = sorted(
            set(self._ids(engine, "cat AND dog")) | set(self._ids(engine, "pig"))
        )
        assert self._ids(engine, "cat dog OR pig") == want

    def test_parens_override(self, engine):
        want = sorted(
            set(self._ids(engine, "cat")) & (set(self._ids(engine, "dog")) | set(self._ids(engine, "pig")))
        )
        assert self._ids(engine, "cat AND (dog OR pig)") == want

    def test_not(self, engine):
        want = sorted(set(self._ids(engine, "cat")) - set(self._ids(engine, "dog")))
        assert self._ids(engine, "cat AND NOT dog") == want
        assert self._ids(engine, "cat NOT dog") == want  # implicit AND

    def test_phrase(self, engine):
        assert self._ids(engine, '"pizza house"') == sorted(
            np.asarray(engine.search_phrase("pizza house")).tolist()
        )
        # phrase composes with boolean ops
        got = self._ids(engine, '"summer pizza" OR "pizza and dogs"')
        want = sorted(
            set(np.asarray(engine.search_phrase("summer pizza")).tolist())
            | set(np.asarray(engine.search_phrase("pizza and dogs")).tolist())
        )
        assert got == want

    def test_case_insensitive_operators_vs_terms(self, engine):
        # lowercase 'and'/'or'/'not' also act as operators (search-box norm)
        assert self._ids(engine, "cat and dog") == self._ids(engine, "cat AND dog")

    @pytest.mark.parametrize(
        "bad",
        ["", "AND cat", "cat AND", "cat (dog", "cat) dog", "NOT dog", "cat AND NOT dog OR NOT pig"],
    )
    def test_malformed_or_pure_negative_raises(self, engine, bad):
        from searchengine_ray.query.boolparse import search_boolean

        with pytest.raises(ValueError):
            search_boolean(engine, bad)

    def test_nested_depth(self, engine):
        got = self._ids(engine, "((cat AND (dog OR (pig AND toy))) OR house)")
        cat = set(self._ids(engine, "cat"))
        dog = set(self._ids(engine, "dog"))
        pig = set(self._ids(engine, "pig"))
        toy = set(self._ids(engine, "toy"))
        house = set(self._ids(engine, "house"))
        assert got == sorted((cat & (dog | (pig & toy))) | house)


class TestMinTermDistance:
    def test_matches_bruteforce_positions(self, ray_session, sf_tiny):
        import itertools

        from searchengine_ray.pipelines.queries import _engine

        eng = _engine(sf_tiny, "punct")
        ids, dist = eng.min_term_distance("fast", "scan")
        got = dict(zip(ids.tolist(), dist.tolist()))
        # brute force from raw analyzed token streams
        import duckdb

        docs = duckdb.sql(
            "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet'"
        ).df()
        for r in docs.itertuples():
            toks = [t for t in r.text.lower().replace(",", " ").replace(".", " ")
                    .replace(";", " ").replace("?", " ").replace("!", " ").split()
                    if t]
            toks = [t for t in toks if t not in __import__(
                "searchengine_ray.analysis.stopwords", fromlist=["STOP_WORDS"]
            ).STOP_WORDS]
            pa_ = [i for i, t in enumerate(toks) if t == "fast"]
            pb_ = [i for i, t in enumerate(toks) if t == "scan"]
            if pa_ and pb_:
                want = min(abs(x - y) for x, y in itertools.product(pa_, pb_))
                assert got.get(r.doc_id) == want, r.doc_id
            else:
                assert r.doc_id not in got


class TestQLDirichlet:
    """Dirichlet query-likelihood (engine.search_ql_dirichlet) vs an
    independent brute-force recomputation from the raw corpus: exact
    cf/|C| accounting, smoothed zero-tf contributions, mu sensitivity,
    (-score, doc_id) ordering, OOV and topk contracts."""

    def _brute(self, engine, query, mu):
        import collections
        import math as m

        tok_by_doc = {d: engine.analyze(t) for d, t in DOCS.items()}
        cf = collections.Counter()
        for toks in tok_by_doc.values():
            cf.update(toks)
        total = sum(cf.values())
        qtoks = engine.analyze(query)
        qterms = [t for t in dict.fromkeys(qtoks) if cf[t] > 0]
        qn = collections.Counter(qtoks)
        out = {}
        for d, toks in tok_by_doc.items():
            tf = collections.Counter(toks)
            if not any(tf[t] for t in qterms):
                continue
            dl = len(toks)
            out[d] = sum(
                qn[t] * m.log((tf[t] + mu * cf[t] / total) / (dl + mu)) for t in qterms
            )
        return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))

    @pytest.mark.parametrize("query", ["cat dog", "pizza summer house", "toy"])
    @pytest.mark.parametrize("mu", [10.0, 2000.0])
    def test_matches_brute_force(self, engine, query, mu):
        got = engine.search_ql_dirichlet(query, mu=mu, topk=None)
        want = self._brute(engine, query, mu)
        assert [d for d, _ in got] == [d for d, _ in want]
        assert np.allclose([s for _, s in got], [s for _, s in want], rtol=1e-12)

    def test_candidates_are_union_not_intersection(self, engine):
        # doc 3 has dog but not cat: must still be scored (smoothed cat mass)
        got = dict(engine.search_ql_dirichlet("cat dog", topk=None))
        assert 3 in got
        # doc 6 has neither → absent
        assert 6 not in got

    def test_oov_term_skipped_not_fatal(self, engine):
        with_oov = engine.search_ql_dirichlet("cat zzzunseen", topk=None)
        without = engine.search_ql_dirichlet("cat", topk=None)
        assert [d for d, _ in with_oov] == [d for d, _ in without]

    def test_all_oov_empty(self, engine):
        assert engine.search_ql_dirichlet("zzz qqq", topk=None) == []

    def test_topk_prefix(self, engine):
        full = engine.search_ql_dirichlet("cat dog toy", topk=None)
        assert engine.search_ql_dirichlet("cat dog toy", topk=3) == full[:3]
        assert engine.search_ql_dirichlet("cat dog toy", topk=0) == []

    def test_duplicate_query_terms_weight(self, engine):
        once = dict(engine.search_ql_dirichlet("cat dog", topk=None))
        twice = dict(engine.search_ql_dirichlet("cat cat dog", topk=None))
        # doubling a term's multiplicity doubles its contribution only
        assert set(once) == set(twice)
        assert any(abs(twice[d] - once[d]) > 1e-9 for d in once)
