"""HITS (Kleinberg's hubs & authorities) over a link graph.

The companion link-analysis score to PageRank (``pagerank.py``): where
PageRank models a random surfer, HITS models the mutual reinforcement
between *hubs* (pages that link to many good authorities) and
*authorities* (pages linked from many good hubs):

    auth(p) ← Σ_{(q,p)∈E} hub(q)        then normalize
    hub(q)  ← Σ_{(q,p)∈E} auth(p)       then normalize

Normalization is **max-division** (divide by the vector max) rather than
the textbook L2 norm: max is order-independent, so the distributed Ray
result, the numpy oracle, and the unrolled-SQL driver oracle agree
bit-for-bit after a round(6), the same contract ``pagerank`` uses.
Rankings are identical under any positive scaling.

Two implementations with identical results (pytest-asserted):

- :func:`hits_numpy` — driver-side bincount iteration (small graphs and
  the test oracle),
- :func:`hits_ray` — Ray-Data-native broadcast tier: the edge list stays
  a ``Dataset``; per half-iteration the current vector is ``ray.put``
  once and each ``map_batches`` task pre-aggregates per-destination
  contributions (partial combine); partials are summed with the
  partition-bucket pattern (node-cardinality groups — DESIGN.md
  round-4 rule) and scattered vectorized on the driver.
  The O(n) score vectors live on the driver (8 bytes/node — fine to
  ~10^9 nodes); past that, the fully partitioned pattern of
  ``pagerank_ray_partitioned`` applies verbatim (vector as a Dataset,
  hash-join per half-step) since HITS's half-steps are the same
  join+groupby shape.
"""

from __future__ import annotations

import numpy as np


def hits_numpy(
    edges: np.ndarray, n: int, num_iterations: int = 20
) -> tuple[np.ndarray, np.ndarray]:
    """edges: (m, 2) int [src, dst]; returns (authority, hub) vectors,
    each max-normalized to 1.0. Fixed iteration count (no early stop) so
    the unrolled SQL oracle reaches the identical point."""
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    src, dst = edges[:, 0], edges[:, 1]
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(num_iterations):
        auth = np.bincount(dst, weights=hub[src], minlength=n)
        m = auth.max()
        if m > 0:
            auth = auth / m
        hub = np.bincount(src, weights=auth[dst], minlength=n)
        m = hub.max()
        if m > 0:
            hub = hub / m
    return auth, hub


def hits_ray(
    edges_ds, n: int, num_iterations: int = 20
) -> tuple[np.ndarray, np.ndarray]:
    """Ray-Data-native HITS over an edges Dataset ``(src:int64,
    dst:int64)``. Ray must already be initialised. Returns
    (authority, hub) numpy vectors — broadcast tier, see module doc."""
    import pyarrow as pa
    import ray

    edges_ds = edges_ds.materialize()  # static edge list, reused 2× per iter
    n_parts = 32

    def half_step(vec: np.ndarray, gather_from: str, gather_to: str) -> np.ndarray:
        """out[t] = Σ vec[f] over edges, f=gather_from col, t=gather_to.

        Per-batch partial bincount (combiner) → partition-bucket sum
        (node-cardinality groups; a native groupby(node).aggregate pays
        per-GROUP Python — see functions/dedup.py) → one vectorized
        driver scatter (each node lands in exactly one partition)."""
        ref = ray.put(vec)

        def contrib(batch: pa.Table, _ref=ref) -> pa.Table:
            v = ray.get(_ref)
            f = batch[gather_from].to_numpy(zero_copy_only=False)
            t = batch[gather_to].to_numpy(zero_copy_only=False)
            u, idx = np.unique(t, return_inverse=True)
            sums = np.bincount(idx, weights=v[f])
            return pa.table(
                {
                    "_np": pa.array((u % n_parts).astype(np.int32), pa.int32()),
                    "node": pa.array(u, pa.int64()),
                    "c": pa.array(sums, pa.float64()),
                }
            )

        def comb(g) -> pa.Table:
            g = g.combine_chunks()
            node = g["node"].to_numpy(zero_copy_only=False)
            c = g["c"].to_numpy(zero_copy_only=False)
            u, idx = np.unique(node, return_inverse=True)
            return pa.table(
                {
                    "node": pa.array(u, pa.int64()),
                    "s": pa.array(np.bincount(idx, weights=c), pa.float64()),
                }
            )

        df = (
            edges_ds.map_batches(contrib, batch_format="pyarrow")
            .groupby("_np")
            .map_groups(comb, batch_format="pyarrow")
            .to_pandas()
        )
        out = np.zeros(n)
        out[df["node"].to_numpy(np.int64)] = df["s"].to_numpy(np.float64)
        return out

    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(num_iterations):
        auth = half_step(hub, "src", "dst")
        m = auth.max()
        if m > 0:
            auth = auth / m
        hub = half_step(auth, "dst", "src")
        m = hub.max()
        if m > 0:
            hub = hub / m
    return auth, hub
