"""PageRank + combined web-search tests (reference
``IcsSearchEnginePageRankTest`` / ``IcsSearchEngineTest`` patterns)."""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_ray.rank import (
    WebSearchEngine,
    pagerank_numpy,
    pagerank_ray,
    pagerank_scores_sorted,
)
from searchengine_ray.sources.links import generate_links, links_table


def reference_style_oracle(edges: np.ndarray, n: int, iters: int = 100) -> np.ndarray:
    """Literal transcription of the reference loop semantics (dense)."""
    A = np.zeros((n, n))
    outdeg = np.bincount(edges[:, 0], minlength=n)
    for s, d in edges:
        A[d, s] = 1.0 / outdeg[s]
    x = np.ones(n)
    for _ in range(iters):
        y = 0.15 + 0.85 * (A @ x)
        diff = np.abs(x - y).sum()
        x = y
        if diff < 1e-5:
            break
    return x


class TestPageRank:
    def test_matches_dense_oracle(self):
        edges = np.array([[0, 1], [1, 2], [2, 0], [3, 0], [3, 2]])
        got = pagerank_numpy(edges, 4)
        want = reference_style_oracle(edges, 4)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_dangling_nodes_lose_mass(self):
        # node 1 dangles: its score stays but contributes nothing
        edges = np.array([[0, 1]])
        scores = pagerank_numpy(edges, 3)
        assert scores[1] > scores[0] == scores[2] == pytest.approx(0.15, abs=1e-6)

    def test_hub_dominates(self):
        edges = generate_links(200)
        scores = pagerank_numpy(edges, 200)
        top = pagerank_scores_sorted(scores)[:5]
        assert any(doc < 2 for doc, _ in top)  # a hub page ranks top

    def test_ray_matches_numpy(self, ray_session):
        import ray.data as rd

        edges = generate_links(300)
        want = pagerank_numpy(edges, 300)
        got = pagerank_ray(rd.from_arrow(links_table(edges)), 300)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_sorted_scores_descending_stable(self):
        scores = np.array([0.5, 0.9, 0.5, 0.1])
        assert pagerank_scores_sorted(scores) == [
            (1, 0.9), (0, 0.5), (2, 0.5), (3, 0.1),
        ]


class TestWebSearch:
    @pytest.fixture(scope="class")
    def web(self, ray_session, tmp_path_factory):
        from searchengine_ray.build import build_index
        from tests.test_build import write_docs_parquet

        docs = {
            0: "popular hub page about search engines",
            1: "obscure page about search engines",
            2: "another page about engines and indexing",
            3: "unrelated gardening page",
        }
        d = tmp_path_factory.mktemp("webc")
        write_docs_parquet(d / "docs.parquet", docs)
        idx = tmp_path_factory.mktemp("webidx")
        build_index(str(d / "docs.parquet"), idx, doc_id_column="doc_id", num_shards=2)
        eng = WebSearchEngine(idx)
        # every page links to doc 0
        eng.compute_pagerank(np.array([[1, 0], [2, 0], [3, 0], [0, 1]]), n=4)
        return eng

    def test_zero_weight_equals_tfidf(self, web):
        # reference IcsSearchEngineTest.java:121-133
        combined = web.search_query(["search", "engines"], 4, 0.0)
        tfidf = web.engine.search_tfidf(["search", "engines"], None)
        assert [d for d, _ in combined] == [d for d, _ in tfidf]
        np.testing.assert_allclose(
            [s for _, s in combined], [s for _, s in tfidf], rtol=0
        )

    def test_huge_weight_pagerank_dominates(self, web):
        # reference IcsSearchEngineTest.java:109-116 (weight 1e9)
        combined = web.search_query(["search", "engines"], 3, 1e9)
        assert combined[0][0] == 0  # the hub ranks first


class TestPartitionedPageRank:
    def test_partitioned_matches_numpy(self, ray_session):
        import ray.data as rd

        from searchengine_ray.rank.pagerank import pagerank_ray_partitioned

        edges = generate_links(300)
        want = pagerank_numpy(edges, 300)
        out = pagerank_ray_partitioned(
            rd.from_arrow(links_table(edges)), 300, num_partitions=4
        ).to_pandas()
        got = np.zeros(300)
        got[out["node"].to_numpy()] = out["rank"].to_numpy()
        assert len(out) == 300
        np.testing.assert_allclose(got, want, rtol=1e-9)


class TestHITS:
    def test_dense_oracle(self):
        """Dense-matrix HITS transcription == hits_numpy on a small graph."""
        from searchengine_ray.rank.hits import hits_numpy

        edges = np.array([[0, 1], [1, 2], [2, 0], [3, 0], [3, 2], [1, 3]])
        n = 4
        A = np.zeros((n, n))
        for s, d in edges:
            A[s, d] = 1.0
        hub = np.ones(n)
        for _ in range(20):
            auth = A.T @ hub
            auth = auth / auth.max()
            hub = A @ auth
            hub = hub / hub.max()
        got_a, got_h = hits_numpy(edges, n, num_iterations=20)
        np.testing.assert_allclose(got_a, auth, rtol=1e-12)
        np.testing.assert_allclose(got_h, hub, rtol=1e-12)

    def test_hub_vs_authority_shape(self):
        """A pure hub (links out, no in-links) gets hub>0, authority==0;
        a pure authority (in-links only) the reverse."""
        from searchengine_ray.rank.hits import hits_numpy

        # 0 -> {2,3}, 1 -> {2,3}: 0,1 pure hubs; 2,3 pure authorities
        edges = np.array([[0, 2], [0, 3], [1, 2], [1, 3]])
        auth, hub = hits_numpy(edges, 4, num_iterations=10)
        assert auth[0] == auth[1] == 0.0
        assert hub[2] == hub[3] == 0.0
        assert auth[2] == auth[3] == 1.0
        assert hub[0] == hub[1] == 1.0

    def test_ray_matches_numpy(self, ray_session):
        """Distributed broadcast-tier HITS == numpy on the synthetic graph."""
        import ray.data as rd

        from searchengine_ray.rank.hits import hits_numpy, hits_ray

        edges = generate_links(300, seed=7)
        auth_np, hub_np = hits_numpy(edges, 300, num_iterations=8)
        auth_r, hub_r = hits_ray(rd.from_arrow(links_table(edges)), 300, num_iterations=8)
        np.testing.assert_allclose(auth_r, auth_np, rtol=1e-9)
        np.testing.assert_allclose(hub_r, hub_np, rtol=1e-9)


class TestPersonalizedPagerank:
    def test_teleport_concentrates_mass(self):
        from searchengine_ray.rank.pagerank import personalized_pagerank_numpy

        n = 100
        ids = np.arange(n)
        edges = np.stack([ids, (ids * 7 + 13) % n], axis=1)
        edges = edges[edges[:, 0] != edges[:, 1]]
        seeds = np.array([3, 5])
        s = personalized_pagerank_numpy(edges, n, seeds, num_iterations=30)
        # seeds and their forward neighborhood dominate; far nodes get ~0
        assert s[3] > s.mean() and s[5] > s.mean()
        reach = {3, 5}
        for _ in range(30):
            reach |= {int((i * 7 + 13) % n) for i in list(reach)}
        unreachable = [i for i in range(n) if i not in reach]
        if unreachable:
            assert s[unreachable].max() < 1e-6

    def test_uniform_seed_matches_standard(self):
        from searchengine_ray.rank.pagerank import (
            pagerank_numpy,
            personalized_pagerank_numpy,
        )

        n = 60
        ids = np.arange(n)
        edges = np.concatenate(
            [np.stack([ids, (ids * 7 + 13) % n], 1), np.stack([ids, (ids * 31 + 5) % n], 1)]
        )
        edges = edges[edges[:, 0] != edges[:, 1]]
        # seeding EVERY node with tele = n/n = 1 is exactly uniform pagerank
        a = personalized_pagerank_numpy(edges, n, ids, num_iterations=40)
        b = pagerank_numpy(edges, n, num_iterations=40, tol=None)
        np.testing.assert_allclose(a, b, rtol=1e-9)

    def test_empty_seed_raises(self):
        import pytest

        from searchengine_ray.rank.pagerank import personalized_pagerank_numpy

        with pytest.raises(ValueError):
            personalized_pagerank_numpy(np.zeros((0, 2)), 5, np.array([]), 3)
