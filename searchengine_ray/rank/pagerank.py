"""PageRank with the reference's exact semantics
(``search/IcsSearchEngine.java:66-150``):

- column-stochastic-ish matrix ``A[dst, src] = 1/outdeg(src)`` (dangling
  nodes contribute nothing — their column is zero, score mass is lost,
  faithfully reproduced),
- ``x`` initialised to 1.0 (NOT 1/N), ``y = (1-α)·e``, per iteration
  ``y = α·A·x + (1-α)·e`` then swap,
- α = 0.85, stop when L1(x, y) < 1e-5 or after ``num_iterations``.

Two implementations with identical results:

- :func:`pagerank_numpy` — driver-side CSR power iteration (small graphs,
  and the oracle for tests),
- :func:`pagerank_ray` — Ray-Data-native: the edge list stays a
  ``Dataset``; each iteration broadcasts the rank vector via ``ray.put``
  (classic broadcast join, no shuffle of the big side), pre-aggregates
  per-destination contributions inside ``map_batches`` (partial
  combine), and sums the partials with the partition-bucket pattern
  (node-cardinality groups — DESIGN.md round-4 rule) before one
  vectorized driver scatter — SURVEY.md §2.5 A7.
"""

from __future__ import annotations

import numpy as np

ALPHA = 0.85
TOL = 1e-5


def _outdeg(edges: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(edges[:, 0], minlength=n).astype(np.float64)


def pagerank_numpy(
    edges: np.ndarray, n: int, num_iterations: int = 100, tol: float | None = TOL
) -> np.ndarray:
    """edges: int array (m, 2) of [src, dst] rows; returns score vector."""
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    outdeg = _outdeg(edges, n)
    inv = np.zeros(n)
    nz = outdeg > 0
    inv[nz] = 1.0 / outdeg[nz]
    src, dst = edges[:, 0], edges[:, 1]
    w = inv[src]
    x = np.ones(n)
    beta = 1.0 - ALPHA
    for _ in range(num_iterations):
        contrib = np.bincount(dst, weights=ALPHA * w * x[src], minlength=n)
        y = beta + contrib
        diff = np.abs(x - y).sum()
        x = y
        if tol is not None and diff < tol:
            break
    return x


def pagerank_ray(
    edges_ds, n: int, num_iterations: int = 100, tol: float | None = TOL
) -> np.ndarray:
    """Ray-Data-native power iteration over an edges Dataset with columns
    ``src:int64, dst:int64``. Ray must already be initialised."""
    import pyarrow as pa
    import ray

    n_parts = 32

    def _bucket_sum(ds_rows, key: str, val: str):
        """Partition-bucket per-key sum (node-cardinality groups — a
        native groupby(key).aggregate pays per-GROUP Python; see
        functions/dedup.py) returning a pandas frame, scattered
        vectorized on the driver (each key lands in one partition)."""

        def add_part(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False)
            return b.append_column(
                "_np", pa.array((k % n_parts).astype(np.int32), pa.int32())
            )

        def comb(g) -> pa.Table:
            g = g.combine_chunks()
            k = g[key].to_numpy(zero_copy_only=False)
            c = g[val].to_numpy(zero_copy_only=False)
            u, idx = np.unique(k, return_inverse=True)
            return pa.table(
                {
                    key: pa.array(u, pa.int64()),
                    val: pa.array(np.bincount(idx, weights=c), pa.float64()),
                }
            )

        return (
            ds_rows.map_batches(add_part, batch_format="pyarrow")
            .groupby("_np")
            .map_groups(comb, batch_format="pyarrow")
            .to_pandas()
        )

    # out-degree: one aggregation over the edge list
    deg = _bucket_sum(
        edges_ds.map_batches(_batch_outdeg, batch_format="pyarrow"), "src", "cnt"
    )
    outdeg = np.zeros(n)
    outdeg[deg["src"].to_numpy(np.int64)] = deg["cnt"].to_numpy(np.float64)
    inv = np.zeros(n)
    nz = outdeg > 0
    inv[nz] = 1.0 / outdeg[nz]

    x = np.ones(n)
    beta = 1.0 - ALPHA
    edges_ds = edges_ds.materialize()  # reused every iteration; edge list only
    for _ in range(num_iterations):
        state_ref = ray.put({"x": x, "inv": inv})

        def contrib_batch(batch: pa.Table, _ref=state_ref) -> pa.Table:
            state = ray.get(_ref)
            xs, invs = state["x"], state["inv"]
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            vals = ALPHA * invs[src] * xs[src]
            # partial combine inside the batch → tiny shuffle
            u, idx = np.unique(dst, return_inverse=True)
            sums = np.bincount(idx, weights=vals)
            return pa.table({"dst": pa.array(u, pa.int64()), "c": pa.array(sums, pa.float64())})

        got = _bucket_sum(
            edges_ds.map_batches(contrib_batch, batch_format="pyarrow"), "dst", "c"
        )
        y = np.full(n, beta)
        y[got["dst"].to_numpy(np.int64)] += got["c"].to_numpy(np.float64)
        diff = np.abs(x - y).sum()
        x = y
        if tol is not None and diff < tol:
            break
    return x


def pagerank_ray_partitioned(
    edges_ds,
    n: int,
    num_iterations: int = 100,
    num_partitions: int = 16,
):
    """Fully partitioned PageRank — the 10^12-node scale path.

    Unlike :func:`pagerank_ray` (which broadcasts a dense O(n) rank
    vector from the driver — ideal while the vector fits one machine),
    the rank vector here IS a Dataset ``(node, rank)``: each iteration is
    one hash join of the weighted edge list against the rank partition
    on ``src``, a ``groupby(dst)`` partial-sum, and one join back to the
    previous ranks to form ``y`` and the L1 convergence term. Nothing
    O(n) ever lives on the driver. Same semantics as the reference
    (init 1.0, dangling mass lost, L1 < 1e-5 stop); float sum order
    differs from the numpy oracle only at machine epsilon (pytest
    asserts rtol 1e-9). Returns a Dataset ``(node, rank)``."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    beta = 1.0 - ALPHA

    inv_ds = (
        edges_ds.map_batches(_batch_outdeg, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Sum("cnt", alias_name="outdeg"))
        .map_batches(
            lambda b: pa.table(
                {
                    "src": b["src"].cast(pa.int64()),
                    "w": pa.array(
                        ALPHA / b["outdeg"].to_numpy(zero_copy_only=False).astype(np.float64),
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    # static weighted edge list: (src, dst, w) — joined once, reused
    edges_w = edges_ds.join(
        inv_ds, join_type="inner", num_partitions=num_partitions, on=("src",)
    ).materialize()

    def init_ranks(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": pa.array(ids, pa.int64()),
             "rank": pa.array(np.ones(len(ids)), pa.float64())}
        )

    x = rd.range(n).map_batches(init_ranks, batch_format="pyarrow").materialize()

    for _ in range(num_iterations):
        contribs = (
            edges_w.join(
                x.map_batches(
                    lambda b: b.rename_columns(["src", "rank"]), batch_format="pyarrow"
                ),
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
            )
            .map_batches(_partitioned_contrib_partial, batch_format="pyarrow")
            .groupby("_np")
            .map_groups(_partitioned_contrib_sum, batch_format="pyarrow")
        )

        def step(b: pa.Table) -> pa.Table:
            xs = b["rank"].to_numpy(zero_copy_only=False)
            contrib = b["contrib"].to_pandas().fillna(0.0).to_numpy()
            y = beta + contrib
            return pa.table(
                {
                    "node": b["node"].cast(pa.int64()),
                    "rank": pa.array(y, pa.float64()),
                    "absdiff": pa.array(np.abs(xs - y), pa.float64()),
                }
            )

        y_ds = (
            x.join(
                contribs,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("node",),
            )
            .map_batches(step, batch_format="pyarrow")
            .materialize()
        )
        diff = y_ds.aggregate(Sum("absdiff", alias_name="d"))["d"] or 0.0
        x = y_ds.select_columns(["node", "rank"])
        if diff < TOL:
            break
    return x


def _batch_outdeg(batch):
    import pyarrow as pa

    src = batch["src"].to_numpy(zero_copy_only=False)
    u, counts = np.unique(src, return_counts=True)
    return pa.table({"src": pa.array(u, pa.int64()), "cnt": pa.array(counts, pa.int64())})


def _partitioned_contrib_partial(b):
    """Per-batch partial node sums for the partitioned PageRank tier,
    bucketed for the vectorized partition-sum below (node-cardinality
    groups — the native aggregate's per-group Python is the thing the
    10^12-node path cannot afford)."""
    import pyarrow as pa

    dst = b["dst"].to_numpy(zero_copy_only=False)
    vals = b["w"].to_numpy(zero_copy_only=False) * b["rank"].to_numpy(
        zero_copy_only=False
    )
    u, idx = np.unique(dst, return_inverse=True)
    sums = np.bincount(idx, weights=vals)
    return pa.table(
        {
            "_np": pa.array((u % 64).astype(np.int32), pa.int32()),
            "node": pa.array(u, pa.int64()),
            "c": pa.array(sums, pa.float64()),
        }
    )


def _partitioned_contrib_sum(g):
    import pyarrow as pa

    g = g.combine_chunks()
    node = g["node"].to_numpy(zero_copy_only=False)
    c = g["c"].to_numpy(zero_copy_only=False)
    u, idx = np.unique(node, return_inverse=True)
    return pa.table(
        {
            "node": pa.array(u, pa.int64()),
            "contrib": pa.array(np.bincount(idx, weights=c), pa.float64()),
        }
    )


def pagerank_scores_sorted(scores: np.ndarray) -> list[tuple[int, float]]:
    """All (doc_id, score) sorted by score descending (reference
    ``getPageRankScores``, ``IcsSearchEngine.java:157-168``; stable on
    ties → ascending id)."""
    order = np.lexsort((np.arange(len(scores)), -scores))
    return [(int(i), float(scores[i])) for i in order]


def personalized_pagerank_numpy(
    edges: np.ndarray,
    n: int,
    seed_ids: np.ndarray,
    num_iterations: int = 20,
) -> np.ndarray:
    """Topic-sensitive (personalized) PageRank: teleport mass
    concentrates on ``seed_ids`` instead of spreading uniformly —
    tele(v) = n/|S| for seeds, 0 elsewhere (total mass matches the
    uniform variant so scores stay comparable). Fixed iteration count,
    no early stop, so an unrolled SQL oracle reaches the identical
    fixed point. Driver CSR tier — the distributed path is the same
    broadcast-rank + groupby(dst) iteration as ``pagerank_ray`` with
    the teleport vector swapped."""
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    outdeg = _outdeg(edges, n)
    inv = np.zeros(n)
    nz = outdeg > 0
    inv[nz] = 1.0 / outdeg[nz]
    src, dst = edges[:, 0], edges[:, 1]
    w = inv[src]
    tele = np.zeros(n)
    seed_ids = np.asarray(seed_ids, dtype=np.int64)
    if len(seed_ids) == 0:
        raise ValueError("personalized pagerank needs a non-empty seed set")
    tele[seed_ids] = n / float(len(seed_ids))
    x = tele.copy()
    beta = 1.0 - ALPHA
    for _ in range(num_iterations):
        contrib = np.bincount(dst, weights=ALPHA * w * x[src], minlength=n)
        x = beta * tele + contrib
    return x
