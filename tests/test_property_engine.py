"""Property sweep: on a randomized (seeded) corpus, the distributed engine
must equal the full-scan oracle for randomized queries across every query
kind — the strongest form of the reference's search-semantics tests."""

from __future__ import annotations

import random

import numpy as np
import pytest

from searchengine_ray.build import build_index
from searchengine_ray.query import SearchEngine
from searchengine_ray.query.oracle import FullScanOracle
from tests.test_build import write_docs_parquet

VOCAB = (
    "cat dog bird fish cow pig horse pizza house summer winter the a of and "
    "running jumper quickly tables chairs window doors compute stored stores"
).split()


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    rng = random.Random(1234)
    docs = {}
    for i in range(120):
        n = rng.randint(0, 30)
        words = [rng.choice(VOCAB) for _ in range(n)]
        # sprinkle punctuation attached to words
        words = [w + rng.choice(["", "", "", ",", ".", "!", "?", ";"]) for w in words]
        docs[i] = " ".join(words)
    d = tmp_path_factory.mktemp("prop")
    write_docs_parquet(d / "docs.parquet", docs)
    idx = tmp_path_factory.mktemp("propidx")
    build_index(
        str(d / "docs.parquet"), idx, doc_id_column="doc_id",
        num_shards=4, block_size=5,
    )
    return SearchEngine(idx), FullScanOracle(docs), docs


def _random_queries(seed: int, n: int):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 4)
        out.append([rng.choice(VOCAB + ["zebra", "missing"]) for _ in range(k)])
    return out


def test_boolean_property_sweep(corpus):
    eng, oracle, _ = corpus
    for q in _random_queries(7, 60):
        assert eng.search_and(q).tolist() == oracle.search_and(q), q
        assert eng.search_or(q).tolist() == oracle.search_or(q), q


def test_ranked_property_sweep(corpus):
    eng, oracle, _ = corpus
    for q in _random_queries(11, 40):
        text = " ".join(q)
        got = eng.search_bm25(text, topk=None)
        want = oracle.search_bm25(text, topk=None)
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=0, atol=0
        )
        gt = eng.search_tfidf(q, None)
        wt = oracle.search_tfidf(q, None)
        assert [d for d, _ in gt] == [d for d, _ in wt], q
        np.testing.assert_allclose([s for _, s in gt], [s for _, s in wt], rtol=0, atol=0)
        for topk in (1, 3):
            ex = eng.search_bm25(text, topk=topk, method="exhaustive")
            assert eng.search_bm25(text, topk=topk, method="wand") == ex, q
            ms = eng.search_bm25(text, topk=topk, method="maxscore")
            assert ms == ex, q  # maxscore falls back to exhaustive when None


def test_phrase_property_sweep(corpus):
    eng, oracle, docs = corpus
    rng = random.Random(13)
    # phrases sampled from real documents (guaranteed hits) + random ones
    phrases = []
    doc_ids = [d for d in docs if len(docs[d].split()) >= 3]
    for _ in range(20):
        d = rng.choice(doc_ids)
        words = docs[d].split()
        i = rng.randint(0, len(words) - 2)
        phrases.append(" ".join(words[i : i + rng.randint(2, 3)]))
    for _ in range(10):
        phrases.append(" ".join(rng.choice(VOCAB) for _ in range(2)))
    for ph in phrases:
        assert eng.search_phrase(ph).tolist() == oracle.search_phrase(ph), ph
