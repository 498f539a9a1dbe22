"""Deterministic link-graph generator (FIXTURES.md §F2).

Mirrors the reference's ``id-graph.tsv`` edge list
(``IcsSearchEngine.java:77-86``): rows ``src dst`` over doc ids, sampled
by preferential attachment (a few pages accumulate high PageRank, like
the www.ics hubs in ``IcsSearchEnginePageRankTest.java:74-110``), with
dangling nodes (out-degree 0, ``:96-99``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def generate_links(n_docs: int, seed: int = 42, avg_out: int = 4) -> np.ndarray:
    """Returns (m, 2) int64 [src, dst] edges; deterministic in (n, seed)."""
    rng = np.random.default_rng((seed, 77))
    edges: list[tuple[int, int]] = []
    # hubs: first ~1% of ids attract most links
    n_hubs = max(1, n_docs // 100)
    for src in range(n_docs):
        if rng.random() < 0.1:
            continue  # dangling node: no outgoing links
        k = 1 + int(rng.integers(avg_out * 2 - 1))
        for _ in range(k):
            if rng.random() < 0.6:
                dst = int(rng.integers(n_hubs))
            else:
                dst = int(rng.integers(n_docs))
            if dst != src:
                edges.append((src, dst))
    return np.asarray(edges, dtype=np.int64).reshape(-1, 2)


def links_table(edges: np.ndarray) -> pa.Table:
    return pa.table(
        {"src": pa.array(edges[:, 0], pa.int64()), "dst": pa.array(edges[:, 1], pa.int64())}
    )
