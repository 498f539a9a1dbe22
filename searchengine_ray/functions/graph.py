"""Graph analytics over an edge Dataset: triangle counting.

``triangle_count`` implements the degree-oriented wedge-check algorithm
(node-iterator++ / the MapReduce formulation of Suri & Vassilvitskii's
"Counting Triangles and the Curse of the Last Reducer", WWW'11 — public
literature):

1. canonicalize + dedup the undirected edge set (partition-bucket
   distinct — edge-cardinality groups, DESIGN.md round-4 rule),
2. compute degrees and attach them to both edge endpoints — degree is
   computed per endpoint-hash bucket (the repo's partition-bucket
   pattern: vectorized ``np.unique`` inside ``groupby(bucket)``
   ``map_groups``) and the two half-rows per edge recombined by a
   bucketed vectorized sum, so nothing is joined or broadcast,
3. orient every edge from its (degree, id)-smaller endpoint to the
   larger — after orientation every vertex has out-degree O(√m) on any
   graph, so the wedge fan-out below is bounded even on power-law
   graphs where a naive id-orientation explodes on hub nodes,
4. wedges: all ordered out-neighbour pairs per source, emitted
   vectorized per source-hash bucket (run-length pair expansion, no
   Python loop over nodes),
5. count wedges whose closing edge exists. Instead of a hash join
   (this Ray version's JoinOperator crashes on empty hash partitions —
   the aggregator's finalize sees a schema-less left table), wedge
   pairs (w=1) and oriented edges (c=1) are unioned and grouped by the
   pair — a group holding both a wedge and a closing edge is a
   triangle, so the answer is ``Sum(w)`` over groups with
   ``Sum(c) > 0``, all native aggregates.

Every shuffle is a Dataset ``groupby`` (native hash aggregate or the
bucket pattern); the driver sees only the final scalar. The SQL oracle
can use the naive id-orientation — the triangle COUNT is
orientation-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_KNUTH = np.uint64(2654435761)


def _bucket_of(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    """Multiplicative-hash bucket — skew-free even for sequential ids."""
    h = (ids.astype(np.uint64) * _KNUTH) % np.uint64(2**32)
    return (h % np.uint64(n_buckets)).astype(np.int32)


def _canon_undirected(edges_ds, src: str, dst: str, n_buckets: int = 32):
    """Distinct undirected edges as (u, v) with u < v, self-loops
    dropped. Edge-cardinality groups → partition-bucket dedup (hash
    (u,v) to a bucket, vectorized per-bucket distinct), not a native
    groupby(["u","v"]) aggregate (per-group Python — the dedup feeds
    EVERY graph operator, so it must be O(edges) vectorized)."""

    def canon(b: pa.Table) -> pa.Table:
        s = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        part = (
            (u.astype(np.uint64) * np.uint64(1000003) + v.astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "_cb": pa.array(part, pa.int32()),
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    def distinct(g) -> pa.Table:
        g = g.combine_chunks()
        u = g["u"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        new = np.ones(len(u), bool)
        new[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        return pa.table(
            {"u": pa.array(u[new], pa.int64()), "v": pa.array(v[new], pa.int64())}
        )

    return (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(distinct, batch_format="pyarrow")
    )


def _pairs_within_runs(starts: np.ndarray, lengths: np.ndarray):
    """Global (first, second) index pairs for all i<j combinations
    inside each contiguous run, fully vectorized.

    ``starts``/``lengths`` describe runs over a sorted array; returns
    index arrays into that array."""
    if len(starts) == 0:
        z = np.zeros(0, np.int64)
        return z, z
    n_total = int(starts[-1] + lengths[-1])
    pos = np.arange(n_total, dtype=np.int64)
    run_id = np.repeat(np.arange(len(starts), dtype=np.int64), lengths)
    run_end = (starts + lengths)[run_id]
    cnt_first = run_end - 1 - pos  # times each element is the pair's first
    firsts = np.repeat(pos, cnt_first)
    total = int(cnt_first.sum())
    if total == 0:
        z = np.zeros(0, np.int64)
        return z, z
    csum = np.concatenate([[0], np.cumsum(cnt_first)[:-1]])
    offs = np.arange(total, dtype=np.int64) - np.repeat(csum, cnt_first) + 1
    return firsts, firsts + offs


def triangle_count(
    edges_ds, src: str = "src", dst: str = "dst", n_buckets: int = 32
) -> int:
    """Number of triangles in the undirected graph of ``edges_ds``."""
    from ray.data.aggregate import Sum

    und = _canon_undirected(edges_ds, src, dst)

    # --- degrees, attached to edges without a join: every edge emits
    # its two directed copies keyed by endpoint; per endpoint-bucket,
    # degree = multiplicity of the node among the copies; the two
    # half-rows of an edge are recombined by one native Sum.
    def directed(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        node = np.concatenate([u, v])
        other = np.concatenate([v, u])
        return pa.table(
            {
                "_bkt": pa.array(_bucket_of(node, n_buckets)),
                "node": pa.array(node, pa.int64()),
                "other": pa.array(other, pa.int64()),
            }
        )

    def deg_halves(g) -> pa.Table:
        node = g["node"].to_numpy(zero_copy_only=False)
        other = g["other"].to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        node, other = node[order], other[order]
        uniq, inv, counts = np.unique(node, return_inverse=True, return_counts=True)
        deg = counts[inv]  # degree of `node` on every directed copy
        is_u = node < other
        u = np.where(is_u, node, other)
        v = np.where(is_u, other, node)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "du_p": pa.array(np.where(is_u, deg, 0), pa.int64()),
                "dv_p": pa.array(np.where(is_u, 0, deg), pa.int64()),
            }
        )

    # recombine the two half-rows per edge with the partition-bucket
    # pattern (edge-cardinality groups — native aggregate pays ~5 µs of
    # Python per group)
    def add_uv_part(b: pa.Table) -> pa.Table:
        u_ = b["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v_ = b["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((u_ * np.uint64(1000003) + v_) % np.uint64(n_buckets)).astype(np.int32)
        return b.append_column("_uvb", pa.array(part, pa.int32()))

    def sum_halves(g) -> pa.Table:
        g = g.combine_chunks()
        u_ = g["u"].to_numpy(zero_copy_only=False)
        v_ = g["v"].to_numpy(zero_copy_only=False)
        dup = g["du_p"].to_numpy(zero_copy_only=False)
        dvp = g["dv_p"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v_, u_))
        u_, v_, dup, dvp = u_[order], v_[order], dup[order], dvp[order]
        new = np.ones(len(u_), bool)
        new[1:] = (u_[1:] != u_[:-1]) | (v_[1:] != v_[:-1])
        starts = np.flatnonzero(new)
        empty = np.empty(0, np.int64)
        return pa.table(
            {
                "u": pa.array(u_[starts], pa.int64()),
                "v": pa.array(v_[starts], pa.int64()),
                "du": pa.array(np.add.reduceat(dup, starts) if len(starts) else empty, pa.int64()),
                "dv": pa.array(np.add.reduceat(dvp, starts) if len(starts) else empty, pa.int64()),
            }
        )

    with_deg = (
        und.map_batches(directed, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(deg_halves, batch_format="pyarrow")
        .map_batches(add_uv_part, batch_format="pyarrow")
        .groupby("_uvb")
        .map_groups(sum_halves, batch_format="pyarrow")
    )

    # --- orient from the (degree, id)-smaller endpoint; keep the head's
    # degree for the wedge-pair ordering below.
    def orient(b: pa.Table) -> pa.Table:
        if not all(n in b.column_names for n in ("u", "v", "du", "dv")):
            return pa.table({c: pa.array([], pa.int64()) for c in ("a", "b", "db")})
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        du = b["du"].to_numpy(zero_copy_only=False)
        dv = b["dv"].to_numpy(zero_copy_only=False)
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {
                "a": pa.array(np.where(u_first, u, v), pa.int64()),
                "b": pa.array(np.where(u_first, v, u), pa.int64()),
                "db": pa.array(np.where(u_first, dv, du), pa.int64()),
            }
        )

    oriented = with_deg.map_batches(orient, batch_format="pyarrow").materialize()

    # --- wedges: per source-bucket, sort by (a, db, b) and expand each
    # source's run into its ordered out-neighbour pairs.
    def tag_src(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        return b.append_column("_bkt", pa.array(_bucket_of(a, n_buckets)))

    def wedge_pairs(g) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        bb = g["b"].to_numpy(zero_copy_only=False)
        db = g["db"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, db, a))
        a, bb, db = a[order], bb[order], db[order]
        _, starts, lengths = np.unique(a, return_index=True, return_counts=True)
        fi, si = _pairs_within_runs(starts.astype(np.int64), lengths.astype(np.int64))
        n = len(fi)
        # pair is ordered by (db, b) within the run — matches the
        # closing edge's own orientation
        return pa.table(
            {
                "p": pa.array(bb[fi], pa.int64()),
                "q": pa.array(bb[si], pa.int64()),
                "w": pa.array(np.ones(n, np.int64)),
                "c": pa.array(np.zeros(n, np.int64)),
            }
        )

    wedges = (
        oriented.map_batches(tag_src, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(wedge_pairs, batch_format="pyarrow")
    )

    def closing_edges(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "p": b["a"],
                "q": b["b"],
                "w": pa.array(np.zeros(n, np.int64)),
                "c": pa.array(np.ones(n, np.int64)),
            }
        )

    tagged = wedges.union(oriented.map_batches(closing_edges, batch_format="pyarrow"))

    # (p, q) resolution via the partition-bucket pattern, NOT a native
    # groupby(["p","q"]).aggregate: wedge-pair cardinality ~ rows, and
    # Ray's native aggregate pays per-GROUP Python overhead (~5 µs/group
    # measured — see functions/dedup.py pair counting). Hash each pair
    # to a partition, then ONE vectorized sorted-run pass per partition
    # sums w/c per pair and folds the triangle partial immediately.
    def add_pq_part(b: pa.Table) -> pa.Table:
        p = b["p"].to_numpy(zero_copy_only=False).astype(np.uint64)
        q = b["q"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((p * np.uint64(1000003) + q) % np.uint64(n_buckets)).astype(np.int32)
        return b.append_column("_pqb", pa.array(part, pa.int32()))

    def tri_of_partition(g) -> pa.Table:
        g = g.combine_chunks()
        p = g["p"].to_numpy(zero_copy_only=False)
        q = g["q"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((q, p))
        p, q, w, c = p[order], q[order], w[order], c[order]
        new = np.ones(len(p), bool)
        new[1:] = (p[1:] != p[:-1]) | (q[1:] != q[:-1])
        starts = np.flatnonzero(new)
        ws = np.add.reduceat(w, starts) if len(starts) else np.empty(0, np.int64)
        cs = np.add.reduceat(c, starts) if len(starts) else np.empty(0, np.int64)
        return pa.table({"t": pa.array([int(ws[cs > 0].sum())], pa.int64())})

    out = (
        tagged.map_batches(add_pq_part, batch_format="pyarrow")
        .groupby("_pqb")
        .map_groups(tri_of_partition, batch_format="pyarrow")
        .aggregate(Sum("t", alias_name="t"))
    )
    return int(out["t"] or 0)


def node_triangles(
    edges_ds, src: str = "src", dst: str = "dst", n_buckets: int = 32
) -> pd.DataFrame:
    """Per-node triangle participation counts AND degrees for the
    undirected graph of ``edges_ds`` — the local-clustering-coefficient
    primitive (coefficient = 2·tri / (deg·(deg−1))).

    Same degree-oriented machinery as :func:`triangle_count` (Suri &
    Vassilvitskii WWW'11), with two changes:

    - wedge rows CARRY THEIR CENTER, so a closed wedge can credit all
      three corners (center, p, q) instead of adding 1 to a global sum;
    - the wedge/closing-edge union is resolved per (p, q)-hash bucket
      with one vectorized pass (sorted-run scan) — the repo's
      partition-bucket pattern — because the native-aggregate trick
      used for the scalar count cannot emit per-wedge rows.

    Degrees ride the same shuffles: the degree table is unioned with
    the per-node triangle partials and combined by one Sum groupby, so
    no node⋈node join is needed. Returns a pandas DataFrame
    (node, deg, tri) for every edge-touched node — node-sized, the
    vocabulary-tier output this repo lets reach the driver."""
    from ray.data.aggregate import Sum

    und = _canon_undirected(edges_ds, src, dst)

    def directed(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        node = np.concatenate([u, v])
        other = np.concatenate([v, u])
        return pa.table(
            {
                "_bkt": pa.array(_bucket_of(node, n_buckets)),
                "node": pa.array(node, pa.int64()),
                "other": pa.array(other, pa.int64()),
            }
        )

    def deg_halves(g) -> pa.Table:
        node = g["node"].to_numpy(zero_copy_only=False)
        other = g["other"].to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        node, other = node[order], other[order]
        uniq, inv, counts = np.unique(node, return_inverse=True, return_counts=True)
        deg = counts[inv]
        is_u = node < other
        u = np.where(is_u, node, other)
        v = np.where(is_u, other, node)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "du_p": pa.array(np.where(is_u, deg, 0), pa.int64()),
                "dv_p": pa.array(np.where(is_u, 0, deg), pa.int64()),
            }
        )

    # recombine the two half-rows per edge with the partition-bucket
    # pattern (edge-cardinality groups — native aggregate pays ~5 µs of
    # Python per group)
    def add_uv_part(b: pa.Table) -> pa.Table:
        u_ = b["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v_ = b["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((u_ * np.uint64(1000003) + v_) % np.uint64(n_buckets)).astype(np.int32)
        return b.append_column("_uvb", pa.array(part, pa.int32()))

    def sum_halves(g) -> pa.Table:
        g = g.combine_chunks()
        u_ = g["u"].to_numpy(zero_copy_only=False)
        v_ = g["v"].to_numpy(zero_copy_only=False)
        dup = g["du_p"].to_numpy(zero_copy_only=False)
        dvp = g["dv_p"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v_, u_))
        u_, v_, dup, dvp = u_[order], v_[order], dup[order], dvp[order]
        new = np.ones(len(u_), bool)
        new[1:] = (u_[1:] != u_[:-1]) | (v_[1:] != v_[:-1])
        starts = np.flatnonzero(new)
        empty = np.empty(0, np.int64)
        return pa.table(
            {
                "u": pa.array(u_[starts], pa.int64()),
                "v": pa.array(v_[starts], pa.int64()),
                "du": pa.array(np.add.reduceat(dup, starts) if len(starts) else empty, pa.int64()),
                "dv": pa.array(np.add.reduceat(dvp, starts) if len(starts) else empty, pa.int64()),
            }
        )

    with_deg = (
        und.map_batches(directed, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(deg_halves, batch_format="pyarrow")
        .map_batches(add_uv_part, batch_format="pyarrow")
        .groupby("_uvb")
        .map_groups(sum_halves, batch_format="pyarrow")
    )

    def orient(b: pa.Table) -> pa.Table:
        cols = ("a", "b", "db", "da")
        if not all(n in b.column_names for n in ("u", "v", "du", "dv")):
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        du = b["du"].to_numpy(zero_copy_only=False)
        dv = b["dv"].to_numpy(zero_copy_only=False)
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {
                "a": pa.array(np.where(u_first, u, v), pa.int64()),
                "b": pa.array(np.where(u_first, v, u), pa.int64()),
                "db": pa.array(np.where(u_first, dv, du), pa.int64()),
                "da": pa.array(np.where(u_first, du, dv), pa.int64()),
            }
        )

    oriented = with_deg.map_batches(orient, batch_format="pyarrow").materialize()

    def tag_src(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        return b.append_column("_bkt", pa.array(_bucket_of(a, n_buckets)))

    def wedge_pairs(g) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        bb = g["b"].to_numpy(zero_copy_only=False)
        db = g["db"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, db, a))
        a, bb = a[order], bb[order]
        _, starts, lengths = np.unique(a, return_index=True, return_counts=True)
        fi, si = _pairs_within_runs(starts.astype(np.int64), lengths.astype(np.int64))
        n = len(fi)
        return pa.table(
            {
                "p": pa.array(bb[fi], pa.int64()),
                "q": pa.array(bb[si], pa.int64()),
                "ctr": pa.array(a[fi], pa.int64()),
                "c": pa.array(np.zeros(n, np.int64)),
            }
        )

    wedges = (
        oriented.map_batches(tag_src, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(wedge_pairs, batch_format="pyarrow")
    )

    def closing_edges(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "p": b["a"],
                "q": b["b"],
                "ctr": pa.array(np.full(n, -1, np.int64)),
                "c": pa.array(np.ones(n, np.int64)),
            }
        )

    def tag_pair(b: pa.Table) -> pa.Table:
        p = b["p"].to_numpy(zero_copy_only=False)
        q = b["q"].to_numpy(zero_copy_only=False)
        mix = (p.astype(np.uint64) * _KNUTH) ^ q.astype(np.uint64)
        bkt = ((mix * _KNUTH) % np.uint64(2**32) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return b.append_column("_bkt", pa.array(bkt))

    def credit_corners(g) -> pa.Table:
        p = g["p"].to_numpy(zero_copy_only=False)
        q = g["q"].to_numpy(zero_copy_only=False)
        ctr = g["ctr"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((q, p))
        p, q, ctr, c = p[order], q[order], ctr[order], c[order]
        # run boundaries over the sorted (p, q) pairs
        new_run = np.ones(len(p), bool)
        if len(p) > 1:
            new_run[1:] = (p[1:] != p[:-1]) | (q[1:] != q[:-1])
        run_id = np.cumsum(new_run) - 1
        n_runs = int(run_id[-1]) + 1 if len(p) else 0
        closed = np.zeros(n_runs, bool)
        np.logical_or.at(closed, run_id, c > 0)
        hit = (c == 0) & closed[run_id]
        nodes = np.concatenate([ctr[hit], p[hit], q[hit]])
        uniq, counts = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq, pa.int64()),
                "deg_p": pa.array(np.zeros(len(uniq), np.int64)),
                "tri_p": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    tri_partials = (
        wedges.union(oriented.map_batches(closing_edges, batch_format="pyarrow"))
        .map_batches(tag_pair, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(credit_corners, batch_format="pyarrow")
    )

    # degrees ride the same node groupby: the oriented edge table knows
    # both endpoint degrees, so each batch emits one (node, deg) row per
    # node it sees; a node's degree repeats across batches with the same
    # value, so Max (not Sum) recovers it in the combining aggregate.
    def deg_rows(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        da = b["da"].to_numpy(zero_copy_only=False)
        db = b["db"].to_numpy(zero_copy_only=False)
        node = np.concatenate([a, bb])
        deg = np.concatenate([da, db])
        # batch-local dedup: one (node, deg) row per node per batch
        uniq, idx = np.unique(node, return_index=True)
        return pa.table(
            {
                "node": pa.array(uniq, pa.int64()),
                "deg_p": pa.array(deg[idx], pa.int64()),
                "tri_p": pa.array(np.zeros(len(uniq), np.int64)),
            }
        )

    from ray.data.aggregate import Max

    per_node = (
        tri_partials.union(oriented.map_batches(deg_rows, batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Max("deg_p", alias_name="_deg_max"), Sum("tri_p", alias_name="tri"))
        .to_pandas()
    )
    out = per_node.rename(columns={"_deg_max": "deg"})
    return (
        out[["node", "deg", "tri"]]
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "deg": "int64", "tri": "int64"})
    )


def common_neighbor_scores(edges_ds, src: str = "src", dst: str = "dst",
                           top_k: int = 20, n_buckets: int = 64):
    """Link prediction by common-neighbor count (the classic
    Liben-Nowell & Kleinberg 2003 baseline): for every NON-adjacent pair
    (u, v), score = |N(u) ∩ N(v)|; returns the top-k pairs.

    Same shuffle shape as ``triangle_count``: wedges are emitted
    vectorized per center-hash bucket (all leaf pairs of each center),
    existing edges are unioned in as blockers, and one (p, q) groupby
    yields common-neighbor counts with an adjacency flag — pairs with a
    blocker are dropped, per-batch partial top-k bounds what reaches the
    driver. Caveat (documented, as with triangles): wedge fan-out is
    Σ deg², so a hub-heavy graph needs degree capping or sampling —
    callers feed bounded-degree graphs (the registry entry uses the
    hub-free synthetic edge set)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    canon = _canon_undirected(edges_ds, src, dst).materialize()

    def both_dirs(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        a = np.concatenate([u, v])
        le = np.concatenate([v, u])
        t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(le, pa.int64())})
        return t.append_column("_bkt", pa.array(_bucket_of(a, n_buckets)))

    def wedge_pairs(g) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        bb = g["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, a))
        a, bb = a[order], bb[order]
        _, starts, lengths = np.unique(a, return_index=True, return_counts=True)
        fi, si = _pairs_within_runs(starts.astype(np.int64), lengths.astype(np.int64))
        n = len(fi)
        return pa.table(
            {
                "p": pa.array(bb[fi], pa.int64()),
                "q": pa.array(bb[si], pa.int64()),
                "w": pa.array(np.ones(n, np.int64)),
                "c": pa.array(np.zeros(n, np.int64)),
            }
        )

    wedges = (
        canon.map_batches(both_dirs, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(wedge_pairs, batch_format="pyarrow")
    )

    def blockers(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "p": b["u"].cast(pa.int64()),
                "q": b["v"].cast(pa.int64()),
                "w": pa.array(np.zeros(n, np.int64)),
                "c": pa.array(np.ones(n, np.int64)),
            }
        )

    # wedge-pair-cardinality groups → partition-bucket sums (see
    # triangle_count; native aggregate pays per-group Python)
    def add_pq_part(b: pa.Table) -> pa.Table:
        p = b["p"].to_numpy(zero_copy_only=False).astype(np.uint64)
        q = b["q"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((p * np.uint64(1000003) + q) % np.uint64(n_buckets)).astype(np.int32)
        return b.append_column("_pqb", pa.array(part, pa.int32()))

    def sum_pairs(g) -> pa.Table:
        g = g.combine_chunks()
        p = g["p"].to_numpy(zero_copy_only=False)
        q = g["q"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((q, p))
        p, q, w, c = p[order], q[order], w[order], c[order]
        new = np.ones(len(p), bool)
        new[1:] = (p[1:] != p[:-1]) | (q[1:] != q[:-1])
        starts = np.flatnonzero(new)
        empty = np.empty(0, np.int64)
        return pa.table(
            {
                "p": pa.array(p[starts], pa.int64()),
                "q": pa.array(q[starts], pa.int64()),
                "common": pa.array(np.add.reduceat(w, starts) if len(starts) else empty, pa.int64()),
                "adj": pa.array(np.add.reduceat(c, starts) if len(starts) else empty, pa.int64()),
            }
        )

    per_pair = (
        wedges.union(canon.map_batches(blockers, batch_format="pyarrow"))
        .map_batches(add_pq_part, batch_format="pyarrow")
        .groupby("_pqb")
        .map_groups(sum_pairs, batch_format="pyarrow")
    )

    def partial_topk(b: pa.Table) -> pa.Table:
        if not all(n in b.column_names for n in ("common", "adj")):
            return pa.table(
                {"node_a": pa.array([], pa.int64()), "node_b": pa.array([], pa.int64()),
                 "common": pa.array([], pa.int64())}
            )
        adj = b["adj"].to_numpy(zero_copy_only=False)
        com = b["common"].to_numpy(zero_copy_only=False)
        p = b["p"].to_numpy(zero_copy_only=False)
        q = b["q"].to_numpy(zero_copy_only=False)
        keep = (adj == 0) & (com > 0)
        p, q, com = p[keep], q[keep], com[keep]
        order = np.lexsort((q, p, -com))[:top_k]
        return pa.table(
            {
                "node_a": pa.array(p[order], pa.int64()),
                "node_b": pa.array(q[order], pa.int64()),
                "common": pa.array(com[order], pa.int64()),
            }
        )

    part = per_pair.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    return (
        part.sort_values(["common", "node_a", "node_b"], ascending=[False, True, True])
        .head(top_k)
        .reset_index(drop=True)
        .astype({"node_a": "int64", "node_b": "int64", "common": "int64"})
    )


KCORE_DENSE_GATE = 100_000  # below: driver numpy peel; above: Dataset rounds


def k_core(edges: np.ndarray, n_nodes: int, k: int, max_iter: int = 12) -> pd.DataFrame:
    """k-core decomposition by iterative peeling: drop every node whose
    degree (within the surviving subgraph) is < k until a fixpoint.

    Returns (node, deg) for the core members with their within-core
    degree, sorted by node. Raises if ``max_iter`` rounds don't reach
    the fixpoint (callers pick max_iter ≥ the peel depth so a SQL
    oracle can unroll the same fixed number of rounds).

    Tiers (the components/pagerank convention): below ``_DENSE_GATE``
    nodes a driver numpy peel is the right engineering — per-iteration
    Dataset overhead dominates at that size; above it each round is one
    endpoint-exploded ``groupby(node).count()`` plus a batch-local
    alive-mask filter (mask broadcast via ``ray.put``, id-dense graphs).
    The arbitrary-id 100-TB path replaces the mask with the same
    co-partition node⋈edge join ``connected_components`` uses — one
    hash join per round on the SAME key, so partitioning is reused."""
    edges = np.asarray(edges, dtype=np.int64)
    edges = edges[edges[:, 0] != edges[:, 1]]
    a = np.minimum(edges[:, 0], edges[:, 1])
    b = np.maximum(edges[:, 0], edges[:, 1])
    packed = np.unique(a.astype(np.uint64) * np.uint64(n_nodes) + b.astype(np.uint64))
    a = (packed // np.uint64(n_nodes)).astype(np.int64)
    b = (packed % np.uint64(n_nodes)).astype(np.int64)

    if n_nodes < KCORE_DENSE_GATE:
        alive = np.ones(n_nodes, bool)
        for _ in range(max_iter):
            keep = alive[a] & alive[b]
            deg = np.bincount(a[keep], minlength=n_nodes) + np.bincount(
                b[keep], minlength=n_nodes
            )
            nxt = alive & (deg >= k)
            if (nxt == alive).all():
                break
            alive = nxt
        else:
            raise RuntimeError(f"k_core did not converge in {max_iter} rounds")
        keep = alive[a] & alive[b]
        deg = np.bincount(a[keep], minlength=n_nodes) + np.bincount(
            b[keep], minlength=n_nodes
        )
        nodes = np.flatnonzero(alive)
        return pd.DataFrame({"node": nodes, "deg": deg[nodes]}).astype(
            {"node": "int64", "deg": "int64"}
        )

    import pyarrow as pa
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    eds = rd.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    ).repartition(max(8, len(a) // 500_000))
    eds = eds.materialize()
    alive = np.ones(n_nodes, bool)
    for it in range(max_iter + 1):
        ref = ray.put(alive)

        def live_ends(t: pa.Table, _r=ref) -> pa.Table:
            m = ray.get(_r)
            aa = t["a"].to_numpy(zero_copy_only=False)
            bb = t["b"].to_numpy(zero_copy_only=False)
            keep = m[aa] & m[bb]
            both = np.concatenate([aa[keep], bb[keep]])
            return pa.table({"node": pa.array(both, pa.int64())})

        deg = (
            eds.map_batches(live_ends, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Count(alias_name="deg"))
            .to_pandas()
        )
        nxt = np.zeros(n_nodes, bool)
        ok = deg[deg["deg"] >= k]
        nxt[ok["node"].to_numpy(np.int64)] = True
        nxt &= alive
        if (nxt == alive).all():
            core = deg[alive[deg["node"].to_numpy(np.int64)] & (deg["deg"] >= k).to_numpy()]
            return (
                core.sort_values("node")
                .reset_index(drop=True)
                .astype({"node": "int64", "deg": "int64"})
            )
        alive = nxt
    raise RuntimeError(f"k_core did not converge in {max_iter} rounds")


POINTER_DENSE_GATE = 200_000  # nodes; below: driver numpy jumping, above: Dataset rounds


def resolve_pointers(
    nodes: np.ndarray,
    ptrs: np.ndarray,
    max_iter: int = 40,
    dense_gate: int = POINTER_DENSE_GATE,
) -> pd.DataFrame:
    """Resolve every node of a functional graph to its terminal by
    POINTER DOUBLING (path compression): each round composes the
    pointer map with itself (f ← f∘f), so a chain of depth d resolves
    in ⌈log₂ d⌉ rounds — the redirect-chain / symlink-resolution /
    union-find-flatten shape, the fifth iterative-graph pattern in this
    module (value propagation, set peeling, frontier expansion,
    min-label propagation, and now doubling).

    ``ptrs[i]`` is where ``nodes[i]`` points; a self-pointer marks a
    terminal. Pointers must be ACYCLIC apart from self-loops (callers'
    redirect tables are; a cycle would never converge and hits the
    ``max_iter`` raise). Hops grow monotonically toward each node's
    true depth, so Sum(hops) is a monotone potential: fixpoint ⇔ the
    scalar stops moving (one scalar aggregate per round, nothing
    node-sized on the driver).

    Scale path: the map is a Dataset keyed by node; one self-join per
    round (same num_partitions co-partition as connected_components),
    hops accumulate through the composition. Below ``dense_gate`` nodes
    the identical numpy jumping runs on the driver. Returns
    (node, terminal, hops) sorted by node."""
    nodes = np.asarray(nodes, np.int64)
    ptrs = np.asarray(ptrs, np.int64)

    if len(nodes) <= dense_gate:
        idx = {int(n): i for i, n in enumerate(nodes)}
        ptr = ptrs.copy()
        hops = (ptr != nodes).astype(np.int64)
        pos = np.asarray([idx[int(p)] for p in ptr], np.int64)
        for _ in range(max_iter):
            nxt = ptr[pos]
            if (nxt == ptr).all():
                return pd.DataFrame(
                    {"node": nodes, "terminal": ptr, "hops": hops}
                ).sort_values("node").reset_index(drop=True).astype(
                    {"node": "int64", "terminal": "int64", "hops": "int64"}
                )
            hops = hops + hops[pos]
            ptr = nxt
            pos = np.asarray([idx[int(p)] for p in ptr], np.int64)
        raise RuntimeError(f"resolve_pointers did not converge in {max_iter} rounds")

    import ray.data as rd
    from ray.data.aggregate import Sum

    f = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "ptr": pa.array(ptrs, pa.int64()),
                "hops": pa.array((ptrs != nodes).astype(np.int64), pa.int64()),
            }
        )
    ).materialize()

    def potential(ds) -> int:
        return int(ds.aggregate(Sum("hops", alias_name="s"))["s"] or 0)

    # hops grow monotonically toward each node's true depth, so
    # Sum(hops) is a monotone potential: fixpoint ⇔ the scalar stops.
    prev = potential(f)
    for _ in range(max_iter):
        # f ← f∘f: look up each row's ptr in the map itself; the right
        # side is renamed so the self-join output is unambiguous.
        rhs = f.map_batches(
            lambda b: pa.table(
                {"tnode": b["node"], "tptr": b["ptr"], "thops": b["hops"]}
            ),
            batch_format="pyarrow",
        )
        f = (
            f.join(
                rhs,
                join_type="inner",
                num_partitions=8,
                on=("ptr",),
                right_on=("tnode",),
            )
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "ptr": b["tptr"],
                        "hops": pa.array(
                            b["hops"].to_numpy(zero_copy_only=False)
                            + b["thops"].to_numpy(zero_copy_only=False),
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur = potential(f)
        if cur == prev:
            out = f.to_pandas().rename(columns={"ptr": "terminal"})
            return out.sort_values("node").reset_index(drop=True).astype(
                {"node": "int64", "terminal": "int64", "hops": "int64"}
            )
        prev = cur
    raise RuntimeError(f"resolve_pointers did not converge in {max_iter} rounds")


BFS_DENSE_GATE = 200_000  # edges; below: driver numpy relax, above: Dataset rounds


SSSP_DENSE_GATE = 200_000  # edges; below: driver numpy relax, above: Dataset rounds


def sssp_weighted(
    edges: np.ndarray,
    weights: np.ndarray,
    n_nodes: int,
    seed: int = 0,
    max_iter: int = 60,
    dense_gate: int = SSSP_DENSE_GATE,
) -> pd.DataFrame:
    """Single-source shortest paths with POSITIVE integer edge weights
    over an undirected edge array — Bellman-Ford relaxation rounds, the
    weighted sibling of :func:`bfs_hops` (same labels ⋈ edges → Min →
    union+Min round shape; the candidate is dist+w instead of dist+1).
    Returns (node, dist) for every reached node, seed at 0.

    Weighted dists still only ever decrease and the reached set only
    grows, so (count, sum) of reached dists is the monotone fixpoint
    potential. Rounds needed ≤ longest shortest path in HOPS (≤ n−1);
    ``max_iter`` bounds it and the non-convergence raise makes a
    truncated answer impossible to mistake for a converged one. Below
    ``dense_gate`` edges the identical numpy relaxation runs on the
    driver."""
    keep = edges[:, 0] != edges[:, 1]
    edges, weights = edges[keep], np.asarray(weights, np.int64)[keep]

    src = np.concatenate([edges[:, 0], edges[:, 1]]).astype(np.int64)
    dst = np.concatenate([edges[:, 1], edges[:, 0]]).astype(np.int64)
    w2 = np.concatenate([weights, weights])

    if len(edges) <= dense_gate:
        INF = np.iinfo(np.int64).max
        dist = np.full(n_nodes, INF, np.int64)
        dist[seed] = 0
        for _ in range(max_iter):
            ok = dist[src] != INF
            cand = dist[src][ok] + w2[ok]
            nxt = dist.copy()
            np.minimum.at(nxt, dst[ok], cand)
            if (nxt == dist).all():
                reached = np.flatnonzero(dist != INF)
                return pd.DataFrame({"node": reached, "dist": dist[reached]}).astype(
                    {"node": "int64", "dist": "int64"}
                )
            dist = nxt
        raise RuntimeError(f"sssp_weighted did not converge in {max_iter} rounds")

    import ray.data as rd
    from ray.data.aggregate import Count, Min, Sum

    eds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "w": pa.array(w2, pa.int64()),
            }
        )
    ).materialize()
    sentinel = np.int64(n_nodes) * (int(w2.max()) + 1)

    def init_label(b: pa.Table) -> pa.Table:
        node = b["src"].to_numpy(zero_copy_only=False)
        dist = np.where(node == seed, np.int64(0), sentinel)
        return pa.table({"node": b["src"], "dist": pa.array(dist, pa.int64())})

    labels = (
        eds.groupby("src")
        .aggregate(Count(alias_name="_d"))
        .map_batches(init_label, batch_format="pyarrow")
        .materialize()
    )

    def potential(ls) -> tuple[int, int]:
        reached = ls.filter(expr=f"dist < {int(sentinel)}")
        agg = reached.aggregate(Count(alias_name="n"), Sum("dist", alias_name="s"))
        return (int(agg["n"]), int(agg["s"] or 0))

    prev = potential(labels)
    for _ in range(max_iter):
        prop = eds.join(
            labels, join_type="inner", num_partitions=8, on=("src",), right_on=("node",)
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["dst"],
                    "dist": pa.array(
                        np.minimum(
                            b["dist"].to_numpy(zero_copy_only=False)
                            + b["w"].to_numpy(zero_copy_only=False),
                            sentinel,
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(prop)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .materialize()
        )
        cur = potential(labels)
        if cur == prev:
            out = labels.to_pandas()
            out = out[out["dist"] < int(sentinel)].sort_values("node").reset_index(drop=True)
            return out.astype({"node": "int64", "dist": "int64"})
        prev = cur
    raise RuntimeError(f"sssp_weighted did not converge in {max_iter} rounds")


CC_DENSE_GATE = 200_000  # edges; below: driver numpy propagation, above: Dataset rounds


def connected_components(
    edges: np.ndarray,
    n_nodes: int,
    max_iter: int = 30,
    dense_gate: int = CC_DENSE_GATE,
) -> pd.DataFrame:
    """Connected components of an undirected edge array by min-label
    propagation: every node starts labeled with its own id; each round
    every node takes the min of its own label and its neighbours'
    labels; at the fixpoint each component is labeled with its smallest
    member id. Returns (node, comp) for every node 0..n_nodes-1
    (isolated nodes are their own singleton component).

    The fourth iterative-graph shape in this module (after pagerank's
    value propagation, k_core's set peeling and bfs_hops' frontier
    expansion). Scale path: labels are a Dataset keyed by node; each
    round is edges ⋈ labels → Min per dst → union + Min — one key-hash
    shuffle per round. Labels only ever decrease, so Sum(comp) is a
    monotone potential: fixpoint ⇔ the scalar stops moving (one scalar
    aggregate per round; nothing node-sized on the driver). Rounds
    needed = max eccentricity of each component's min node; the
    non-convergence raise makes a truncated answer impossible to
    mistake for a converged one. Below ``dense_gate`` edges a
    driver-side numpy propagation produces the identical table.
    """
    edges = edges[edges[:, 0] != edges[:, 1]]

    if len(edges) <= dense_gate:
        src = np.concatenate([edges[:, 0], edges[:, 1]]).astype(np.int64)
        dst = np.concatenate([edges[:, 1], edges[:, 0]]).astype(np.int64)
        comp = np.arange(n_nodes, dtype=np.int64)
        for _ in range(max_iter):
            nxt = comp.copy()
            np.minimum.at(nxt, dst, comp[src])
            if (nxt == comp).all():
                return pd.DataFrame(
                    {"node": np.arange(n_nodes, dtype=np.int64), "comp": comp}
                )
            comp = nxt
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    def undirect(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, c]), pa.int64()),
                "dst": pa.array(np.concatenate([c, a]), pa.int64()),
            }
        )

    eds = (
        rd.from_arrow(
            pa.table({"a": edges[:, 0].astype(np.int64), "b": edges[:, 1].astype(np.int64)})
        )
        .map_batches(undirect, batch_format="pyarrow")
        .materialize()
    )
    labels = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(np.arange(n_nodes, dtype=np.int64), pa.int64()),
                "comp": pa.array(np.arange(n_nodes, dtype=np.int64), pa.int64()),
            }
        )
    ).materialize()

    def potential(ls) -> int:
        return int(ls.aggregate(Sum("comp", alias_name="s"))["s"] or 0)

    prev = potential(labels)
    for _ in range(max_iter):
        prop = eds.join(
            labels, join_type="inner", num_partitions=8, on=("src",), right_on=("node",)
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "comp": b["comp"]}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(prop)
            .groupby("node")
            .aggregate(Min("comp", alias_name="comp"))
            .materialize()
        )
        cur = potential(labels)
        if cur == prev:
            out = labels.to_pandas().sort_values("node").reset_index(drop=True)
            return out.astype({"node": "int64", "comp": "int64"})
        prev = cur
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def bfs_hops(
    edges: np.ndarray,
    n_nodes: int,
    seed: int = 0,
    max_iter: int = 30,
    dense_gate: int = BFS_DENSE_GATE,
) -> pd.DataFrame:
    """Unweighted single-source shortest paths (BFS hop levels) over an
    undirected edge array — the frontier-expansion iterative shape
    (distinct from pagerank's value propagation and k_core's set
    shrinkage). Returns (node, dist) for every REACHED node, seed
    included at dist 0.

    Scale path: labels live as a Dataset of reached nodes; each round is
    edges ⋈ labels → Min(dist+1) per dst → union + Min — the same
    one-key-per-round shuffle as connected-components min-label
    propagation. dist values only ever decrease and the reached set only
    grows, so the (count, sum) pair is a monotone potential: fixpoint ⇔
    both scalars stop moving (two scalar aggregates per round, nothing
    node-sized on the driver). Below ``dense_gate`` edges a driver-side
    numpy relaxation produces the identical table without per-round
    shuffle fixed costs. Rounds needed = graph eccentricity of the seed;
    ``max_iter`` bounds it and the non-convergence raise makes a
    truncated answer impossible to mistake for a converged one."""
    edges = edges[edges[:, 0] != edges[:, 1]]

    if len(edges) <= dense_gate:
        src = np.concatenate([edges[:, 0], edges[:, 1]]).astype(np.int64)
        dst = np.concatenate([edges[:, 1], edges[:, 0]]).astype(np.int64)
        INF = np.iinfo(np.int64).max
        dist = np.full(n_nodes, INF, np.int64)
        dist[seed] = 0
        for _ in range(max_iter):
            cand = dist[src] + 1  # INF+1 wraps negative: mask unreached first
            ok = dist[src] != INF
            nxt = dist.copy()
            np.minimum.at(nxt, dst[ok], cand[ok])
            if (nxt == dist).all():
                reached = np.flatnonzero(dist != INF)
                return pd.DataFrame(
                    {"node": reached, "dist": dist[reached]}
                ).astype({"node": "int64", "dist": "int64"})
            dist = nxt
        raise RuntimeError(f"bfs_hops did not converge in {max_iter} rounds")

    import ray.data as rd
    from ray.data.aggregate import Count, Min, Sum

    def undirect(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, c]), pa.int64()),
                "dst": pa.array(np.concatenate([c, a]), pa.int64()),
            }
        )

    eds = (
        rd.from_arrow(
            pa.table({"a": edges[:, 0].astype(np.int64), "b": edges[:, 1].astype(np.int64)})
        )
        .map_batches(undirect, batch_format="pyarrow")
        .materialize()
    )
    # every edge-touched node starts at the UNREACHED sentinel (n_nodes >
    # any real hop count); the seed starts at 0. Seeding ALL nodes keeps
    # every hash partition of the join's right side non-empty — this Ray
    # version's Arrow join rejects schema-less empty partitions.
    sentinel = np.int64(n_nodes)

    def init_label(b: pa.Table) -> pa.Table:
        node = b["src"].to_numpy(zero_copy_only=False)
        dist = np.where(node == seed, np.int64(0), sentinel)
        return pa.table({"node": b["src"], "dist": pa.array(dist, pa.int64())})

    labels = (
        eds.groupby("src")
        .aggregate(Count(alias_name="_d"))
        .map_batches(init_label, batch_format="pyarrow")
        .materialize()
    )

    def potential(ls) -> tuple[int, int]:
        reached = ls.filter(expr=f"dist < {int(sentinel)}")
        agg = reached.aggregate(Count(alias_name="n"), Sum("dist", alias_name="s"))
        return (int(agg["n"]), int(agg["s"] or 0))

    # dist values only decrease and the reached set only grows, so the
    # (reached count, reached dist sum) pair is a monotone potential:
    # fixpoint ⇔ both scalars stop moving.
    prev = potential(labels)
    for _ in range(max_iter):
        prop = (
            eds.join(labels, join_type="inner", num_partitions=8,
                     on=("src",), right_on=("node",))
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["dst"],
                        "dist": pa.array(
                            np.minimum(
                                b["dist"].to_numpy(zero_copy_only=False) + 1, sentinel
                            ),
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        labels = (
            labels.union(prop)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .materialize()
        )
        cur = potential(labels)
        if cur == prev:
            out = labels.to_pandas()
            out = out[out["dist"] < int(sentinel)].sort_values("node").reset_index(drop=True)
            return out.astype({"node": "int64", "dist": "int64"})
        prev = cur
    raise RuntimeError(f"bfs_hops did not converge in {max_iter} rounds")


MST_DENSE_GATE = 200_000


def boruvka_mst(
    edges: np.ndarray,
    weights: np.ndarray,
    n_nodes: int,
    dense_gate: int = MST_DENSE_GATE,
) -> pd.DataFrame:
    """Minimum spanning forest via Borůvka's algorithm (1926; the
    textbook distributed MST — O(log n) rounds, each round every
    component picks its minimum incident crossing edge). Edge order is
    the total order (w, u, v), which makes the MSF UNIQUE, so any
    correct algorithm (the pytest Kruskal brute, the SQL Kruskal
    replay) must select the identical edge set.

    Returns the selected edges as (u, v, w) sorted by (w, u, v).

    Rounds needed ≤ ⌈log2 n⌉. Per round the min-edge-per-component
    reduction is embarrassingly parallel: above ``dense_gate`` edges it
    runs as ``map_batches`` partial mins over the edge Dataset with the
    component labels broadcast via ``ray.put`` (one O(n) array — the
    PageRank broadcast-tier contract), merged by one small groupby;
    the union step touches only ≤ #components selected edges on the
    driver. Below the gate the identical numpy reduction runs locally."""
    edges = np.asarray(edges, np.int64)
    keep = edges[:, 0] != edges[:, 1]
    u = np.minimum(edges[keep, 0], edges[keep, 1])
    v = np.maximum(edges[keep, 0], edges[keep, 1])
    w = np.asarray(weights, np.int64)[keep]
    # canonical dedup on (u, v): keep the minimum weight per pair
    order = np.lexsort((w, v, u))
    u, v, w = u[order], v[order], w[order]
    first = np.ones(len(u), bool)
    first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
    u, v, w = u[first], v[first], w[first]

    # total order (w, u, v) as a RANK: sort edges once by (w, u, v) and
    # use the position as the reduction key — min-rank per component is
    # min-(w, u, v), with no bit-budget restriction on weights or ids
    # (any int64 weight, including negative, is supported)
    order2 = np.lexsort((v, u, w))
    u, v, w = u[order2], v[order2], w[order2]
    packed = np.arange(len(u), dtype=np.int64)

    comp = np.arange(n_nodes, dtype=np.int64)
    taken: list[int] = []
    use_ray = len(u) > dense_gate

    for _ in range(max(1, int(np.ceil(np.log2(max(n_nodes, 2)))) + 1)):
        cu, cv = comp[u], comp[v]
        cross = cu != cv
        if not cross.any():
            break
        if use_ray:
            sel = _min_edge_per_component_ray(u, v, packed, comp)
        else:
            cid = np.concatenate([cu[cross], cv[cross]])
            key = np.concatenate([packed[cross], packed[cross]])
            o = np.lexsort((key, cid))
            cid, key = cid[o], key[o]
            head = np.ones(len(cid), bool)
            head[1:] = cid[1:] != cid[:-1]
            sel = np.unique(key[head])
        # union the selected edges sequentially (≤ #components of them —
        # the only sequential touch; everything edge-sized stays parallel)
        su = u[sel]
        sv = v[sel]

        def find(x: int) -> int:
            while comp[x] != x:
                comp[x] = comp[comp[x]]
                x = comp[x]
            return int(x)

        for a, b in zip(su.tolist(), sv.tolist()):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                if ra < rb:
                    comp[rb] = ra
                else:
                    comp[ra] = rb
        # under the (w, u, v) total order the per-component min edges
        # can never form a cycle, so every selected edge is in the MSF
        taken.extend(int(x) for x in sel.tolist())
        # path-compress every node label for the next round
        roots = comp.copy()
        while True:
            nxt = roots[roots]
            if (nxt == roots).all():
                break
            roots = nxt
        comp = roots

    sel_packed = np.unique(np.array(sorted(set(taken)), np.int64))
    out = pd.DataFrame(
        {"u": u[sel_packed], "v": v[sel_packed], "w": w[sel_packed]}
    ).astype({"u": "int64", "v": "int64", "w": "int64"})
    return out.sort_values(["w", "u", "v"]).reset_index(drop=True)


def _min_edge_per_component_ray(
    u: np.ndarray, v: np.ndarray, packed: np.ndarray, comp: np.ndarray
) -> np.ndarray:
    """One Borůvka round distributed: broadcast the component labels,
    emit per-batch (component, min packed edge key) partials, reduce
    with one small Min groupby, return the unique selected edge keys."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    comp_ref = ray.put(comp)
    eds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "key": pa.array(packed, pa.int64()),
            }
        )
    )

    def partial(b: pa.Table, _ref=comp_ref) -> pa.Table:
        c = ray.get(_ref)
        bu = b["u"].to_numpy(zero_copy_only=False)
        bv = b["v"].to_numpy(zero_copy_only=False)
        key = b["key"].to_numpy(zero_copy_only=False)
        cu, cv = c[bu], c[bv]
        cross = cu != cv
        cid = np.concatenate([cu[cross], cv[cross]])
        k2 = np.concatenate([key[cross], key[cross]])
        o = np.lexsort((k2, cid))
        cid, k2 = cid[o], k2[o]
        head = np.ones(len(cid), bool)
        head[1:] = cid[1:] != cid[:-1]
        return pa.table(
            {"cid": pa.array(cid[head], pa.int64()), "key": pa.array(k2[head], pa.int64())}
        )

    res = (
        eds.map_batches(partial, batch_format="pyarrow")
        .groupby("cid")
        .aggregate(Min("key", alias_name="key"))
        .to_pandas()
    )
    return np.unique(res["key"].to_numpy(np.int64))


def katz_centrality(
    edges: np.ndarray,
    n_nodes: int,
    alpha: float = 0.05,
    iters: int = 12,
    dense_gate: int = MST_DENSE_GATE,
) -> np.ndarray:
    """Katz centrality (Katz 1953) on a DIRECTED edge array: the
    truncated series x = Σ_{k=1..K} α^k (Aᵀ)^k 1, iterated as
    c_k(dst) = α · Σ_{(src,dst)∈E} (c_{k-1}(src) + 1) — attenuated
    path counting, the walk-based centrality that (unlike PageRank)
    does not normalise by out-degree. Fixed iteration count so the
    unrolled SQL oracle computes the identical truncation.

    Above ``dense_gate`` edges each iteration is one edges⋈labels join
    + Sum-groupby round (the sssp_weighted Dataset-tier shape); below
    it the identical numpy ``np.add.at`` iteration runs locally."""
    edges = np.asarray(edges, np.int64)
    keep = edges[:, 0] != edges[:, 1]
    src, dst = edges[keep, 0], edges[keep, 1]

    if len(src) <= dense_gate:
        c = np.zeros(n_nodes, np.float64)
        for _ in range(iters):
            nxt = np.zeros(n_nodes, np.float64)
            np.add.at(nxt, dst, c[src] + 1.0)
            c = alpha * nxt
        return c

    import ray.data as rd
    from ray.data.aggregate import Sum

    eds = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).materialize()
    labels = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(np.arange(n_nodes, dtype=np.int64), pa.int64()),
                "c": pa.array(np.zeros(n_nodes), pa.float64()),
            }
        )
    ).materialize()
    for _ in range(iters):
        prop = eds.join(
            labels, join_type="inner", num_partitions=8, on=("src",), right_on=("node",)
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["dst"],
                    "contrib": pa.array(
                        b["c"].to_numpy(zero_copy_only=False) + 1.0, pa.float64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        summed = prop.groupby("node").aggregate(Sum("contrib", alias_name="s"))
        got = summed.to_pandas()
        c = np.zeros(n_nodes, np.float64)
        c[got["node"].to_numpy(np.int64)] = alpha * got["s"].to_numpy(np.float64)
        labels = rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(np.arange(n_nodes, dtype=np.int64), pa.int64()),
                    "c": pa.array(c, pa.float64()),
                }
            )
        ).materialize()
    return c


ANF_P = 6  # 64 registers per node


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized ``int.bit_length`` for uint64 (no float64
    round-up hazard near powers of two)."""
    x = x.astype(np.uint64, copy=True)
    bl = np.zeros(x.shape, np.int64)
    for sh in (32, 16, 8, 4, 2, 1):
        m = (x >> np.uint64(sh)) > 0
        bl[m] += sh
        x[m] >>= np.uint64(sh)
    bl[x > 0] += 1
    return bl


def _anf_init_regs(n_nodes: int, p: int = ANF_P) -> tuple[np.ndarray, np.ndarray]:
    """Per-node singleton-HLL init: md5-lower-64 of the decimal node id
    (DuckDB ``md5_number_lower(CAST(id AS VARCHAR))``-equal), register
    = top p bits, rho = leading-zero rank of the tail + 1. Digests are
    batched and decoded with one ``np.frombuffer``; reg/rho are
    vectorized (no per-node Python int ops)."""
    import hashlib

    regs = np.zeros((n_nodes, 1 << p), np.int8)
    shift = 64 - p
    mask = np.uint64((1 << shift) - 1)
    blob = b"".join(
        hashlib.md5(str(v).encode()).digest()[8:] for v in range(n_nodes)
    )
    hv = np.frombuffer(blob, dtype="<u8")
    reg = (hv >> np.uint64(shift)).astype(np.int64)
    tail = hv & mask
    rho = (shift + 1) - _bit_length_u64(tail)
    regs[np.arange(n_nodes), reg] = rho.astype(np.int8)
    return regs, np.zeros(0)


def _anf_estimate_micro(regs: np.ndarray, p: int = ANF_P) -> np.ndarray:
    """Integer-micro HLL estimate per node (linear-counting branch
    mirrored — the repo's hll_error conventions at m = 2^p)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    pow2 = np.power(2.0, -regs.astype(np.float64))  # rho=0 rows contribute 1
    s = pow2.sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    e = alpha * m * m / s
    lin = np.where(zeros > 0, m * np.log(m / np.maximum(zeros, 1).astype(np.float64)), e)
    e = np.where((e <= 2.5 * m) & (zeros > 0), lin, e)
    p10 = 10.0 ** 6
    return (np.sign(e) * np.floor(np.abs(e) * p10 + 0.5)).astype(np.int64)


def anf_hyperball(
    edges: np.ndarray,
    n_nodes: int,
    rounds: int = 6,
    p: int = ANF_P,
    dense_gate: int = MST_DENSE_GATE,
) -> pd.DataFrame:
    """HyperBall approximate neighborhood function (Boldi, Rosa &
    Vigna, WWW 2011; Palmer et al.'s ANF with HLL counters): every node
    carries a 2^p-register HLL of the ball around it; one round updates
    each node's registers to the elementwise max over its neighbours'
    — so N(r) = Σ_v |ball(v, r)| needs only r rounds of a
    (node, register) Max-groupby, never any pairwise BFS. Returns one
    row per radius r: the summed per-node micro-int estimates.

    Below ``dense_gate`` edges the register matrix iterates locally via
    ``np.maximum.at``; above it each round is one edges⋈registers join
    + Max groupby over (node, register) rows — registers ARE the
    shuffle payload, the textbook Dataset expression of the algorithm."""
    edges = np.asarray(edges, np.int64)
    keep = edges[:, 0] != edges[:, 1]
    u, v = edges[keep, 0], edges[keep, 1]
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])

    regs, _ = _anf_init_regs(n_nodes, p)
    out_rows = [(0, int(_anf_estimate_micro(regs, p).sum()))]

    if len(src) <= dense_gate:
        for r in range(1, rounds + 1):
            nxt = regs.copy()
            np.maximum.at(nxt, dst, regs[src])
            regs = nxt
            out_rows.append((r, int(_anf_estimate_micro(regs, p).sum())))
        return pd.DataFrame(out_rows, columns=["r", "est_micro_sum"]).astype(
            {"r": "int64", "est_micro_sum": "int64"}
        )

    import ray.data as rd
    from ray.data.aggregate import Max

    nodes0, regs0 = np.nonzero(regs)
    rho0 = regs[nodes0, regs0]
    cur = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes0.astype(np.int64), pa.int64()),
                "reg": pa.array(regs0.astype(np.int64), pa.int64()),
                "rho": pa.array(rho0.astype(np.int64), pa.int64()),
            }
        )
    ).materialize()
    eds = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).materialize()

    def est_of(ds) -> int:
        df = ds.to_pandas()
        m = np.zeros((n_nodes, 1 << p), np.int8)
        m[df["node"].to_numpy(np.int64), df["reg"].to_numpy(np.int64)] = df[
            "rho"
        ].to_numpy(np.int64)
        return int(_anf_estimate_micro(m, p).sum())

    for r in range(1, rounds + 1):
        prop = eds.join(
            cur, join_type="inner", num_partitions=8, on=("src",), right_on=("node",)
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "reg": b["reg"], "rho": b["rho"]}),
            batch_format="pyarrow",
        )
        cur = (
            cur.union(prop)
            .groupby(["node", "reg"])
            .aggregate(Max("rho", alias_name="rho"))
            .materialize()
        )
        out_rows.append((r, est_of(cur)))
    return pd.DataFrame(out_rows, columns=["r", "est_micro_sum"]).astype(
        {"r": "int64", "est_micro_sum": "int64"}
    )


def salsa_scores(
    edges: np.ndarray,
    n_nodes: int,
    iters: int = 8,
    dense_gate: int = MST_DENSE_GATE,
) -> tuple[np.ndarray, np.ndarray]:
    """SALSA hub/authority scores (Lempel & Moran, WWW 2000 — HITS with
    degree-normalised random walks, immune to the tightly-knit-
    community drift): fixed-point rounds h(i) = Σ_{i→j} a(j)/din(j),
    a(j) = Σ_{i→j} h(i)/dout(i) from a0 ≡ 1, fixed ``iters`` so the
    unrolled SQL oracle replays the identical truncation. DISTINCT
    directed edges; returns (auth, hub) arrays.

    Below ``dense_gate`` the numpy add.at iteration runs locally; above
    it each half-round is one edges⋈scores join + Sum groupby (the
    katz_centrality Dataset-tier shape)."""
    assert n_nodes < (1 << 31), "salsa pack: node ids must fit 31 bits"
    edges = np.asarray(edges, np.int64)
    keep = edges[:, 0] != edges[:, 1]
    packed = edges[keep, 0] * np.int64(1 << 31) + edges[keep, 1]
    packed = np.unique(packed)
    src = (packed >> 31).astype(np.int64)
    dst = (packed & ((1 << 31) - 1)).astype(np.int64)

    dout = np.zeros(n_nodes, np.int64)
    din = np.zeros(n_nodes, np.int64)
    np.add.at(dout, src, 1)
    np.add.at(din, dst, 1)
    a = np.ones(n_nodes, np.float64)
    h = np.zeros(n_nodes, np.float64)

    if len(src) <= dense_gate:
        for _ in range(iters):
            h = np.zeros(n_nodes, np.float64)
            np.add.at(h, src, a[dst] / din[dst])
            a = np.zeros(n_nodes, np.float64)
            np.add.at(a, dst, h[src] / dout[src])
        return a, h

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    eds = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).materialize()
    din_ref = ray.put(din)
    dout_ref = ray.put(dout)

    def half_round(scores: np.ndarray, by_dst: bool) -> np.ndarray:
        ref = ray.put(scores)

        def prop(b: pa.Table, _s=ref, _din=din_ref, _dout=dout_ref) -> pa.Table:
            sc = ray.get(_s)
            if by_dst:  # h(i) = Σ a(j)/din(j)
                deg = ray.get(_din)
                node = b["src"].to_numpy(zero_copy_only=False)
                other = b["dst"].to_numpy(zero_copy_only=False)
            else:  # a(j) = Σ h(i)/dout(i)
                deg = ray.get(_dout)
                node = b["dst"].to_numpy(zero_copy_only=False)
                other = b["src"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": pa.array(node, pa.int64()),
                    "c": pa.array(sc[other] / deg[other], pa.float64()),
                }
            )

        got = (
            eds.map_batches(prop, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("c", alias_name="s"))
            .to_pandas()
        )
        out = np.zeros(n_nodes, np.float64)
        out[got["node"].to_numpy(np.int64)] = got["s"].to_numpy(np.float64)
        return out

    for _ in range(iters):
        h = half_round(a, True)
        a = half_round(h, False)
    return a, h


BETW_MAX_DEPTH = 12


def betweenness_sampled(
    edges: np.ndarray,
    n_nodes: int,
    sources: list[int],
    dense_gate: int = MST_DENSE_GATE,
    max_depth: int = BETW_MAX_DEPTH,
) -> np.ndarray:
    """Betweenness centrality from a fixed source sample (Brandes,
    J. Math. Soc. 2001: one forward BFS accumulating path counts σ,
    one backward sweep accumulating dependencies δ(v) = Σ_{w∈succ}
    σ(v)/σ(w)·(1+δ(w)) — exact for the sampled sources, the standard
    estimator when all-sources is off the table). Undirected edges;
    returns the summed δ per node (sources excluded from their own
    sweep).

    Path counts σ are exact integers. Per level the forward expansion
    and the backward dependency pass are single grouped reductions
    over the edge set; above ``dense_gate`` they run as map_batches
    partials over the edge Dataset with the level arrays broadcast
    (the PageRank broadcast-tier contract: O(n) driver state, nothing
    edge-sized on the driver), below it as the identical numpy
    ``np.add.at`` reductions."""
    assert n_nodes < (1 << 31), "betweenness pack: node ids must fit 31 bits"
    edges = np.asarray(edges, np.int64)
    keep = edges[:, 0] != edges[:, 1]
    u, v = edges[keep, 0], edges[keep, 1]
    # dedup parallel edges — σ counts PATHS, not parallel wires
    packed = np.unique(np.minimum(u, v) * np.int64(1 << 31) + np.maximum(u, v))
    u = (packed >> 31).astype(np.int64)
    v = (packed & ((1 << 31) - 1)).astype(np.int64)
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    use_ray = len(src) > dense_gate

    if use_ray:
        import ray.data as rd

        eds_ds = rd.from_arrow(
            pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
        ).materialize()

    btw = np.zeros(n_nodes, np.float64)
    for s in sources:
        if s >= n_nodes:
            continue
        d = np.full(n_nodes, -1, np.int64)
        sig = np.zeros(n_nodes, np.int64)
        d[s] = 0
        sig[s] = 1
        lev = 0
        while lev < max_depth:
            if use_ray:
                contrib = _level_expand_ray(eds_ds, d, sig, lev)
            else:
                m = (d[src] == lev) & (d[dst] == -1)
                contrib = np.zeros(n_nodes, np.int64)
                np.add.at(contrib, dst[m], sig[src[m]])
            new = contrib > 0
            if not new.any():
                break
            # σ grows multiplicatively per level on path-rich graphs;
            # int64 wraps silently — check BEFORE the add (a wrapped
            # negative would still pass a post-add max bound). contrib
            # only flows to unvisited nodes, whose sig is still 0, so
            # the bound is on contrib alone (not sig.max(), which would
            # falsely abort valid runs); negative contrib means the
            # add.at accumulation itself wrapped.
            assert contrib.min() >= 0 and contrib.max() < (
                1 << 62
            ), "σ overflow — path counts exceed int64"
            d[new] = lev + 1
            sig[new] += contrib[new]
            lev += 1
        if lev >= max_depth:
            m = (d[src] == lev) & (d[dst] == -1)
            assert not m.any(), "BFS truncated — raise BETW_MAX_DEPTH"
        delta = np.zeros(n_nodes, np.float64)
        for k in range(lev, 0, -1):
            if use_ray:
                part = _level_back_ray(eds_ds, d, sig, delta, k)
            else:
                m = (d[src] == k - 1) & (d[dst] == k)
                part = np.zeros(n_nodes, np.float64)
                np.add.at(
                    part,
                    src[m],
                    (sig[src[m]] / sig[dst[m]]) * (1.0 + delta[dst[m]]),
                )
            delta += part
        delta[s] = 0.0
        btw += delta
    return btw


def _level_expand_ray(eds_ds, d: np.ndarray, sig: np.ndarray, lev: int) -> np.ndarray:
    import ray
    from ray.data.aggregate import Sum

    ref = ray.put((d, sig))

    def part(b: pa.Table, _r=ref) -> pa.Table:
        dd, ss = ray.get(_r)
        bs = b["src"].to_numpy(zero_copy_only=False)
        bd = b["dst"].to_numpy(zero_copy_only=False)
        m = (dd[bs] == lev) & (dd[bd] == -1)
        return pa.table(
            {"node": pa.array(bd[m], pa.int64()), "c": pa.array(ss[bs[m]], pa.int64())}
        )

    got = (
        eds_ds.map_batches(part, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("c", alias_name="s"))
        .to_pandas()
    )
    out = np.zeros(len(d), np.int64)
    if len(got):
        out[got["node"].to_numpy(np.int64)] = got["s"].to_numpy(np.int64)
    return out


def _level_back_ray(
    eds_ds, d: np.ndarray, sig: np.ndarray, delta: np.ndarray, k: int
) -> np.ndarray:
    import ray
    from ray.data.aggregate import Sum

    ref = ray.put((d, sig, delta))

    def part(b: pa.Table, _r=ref) -> pa.Table:
        dd, ss, dl = ray.get(_r)
        bs = b["src"].to_numpy(zero_copy_only=False)
        bd = b["dst"].to_numpy(zero_copy_only=False)
        m = (dd[bs] == k - 1) & (dd[bd] == k)
        return pa.table(
            {
                "node": pa.array(bs[m], pa.int64()),
                "c": pa.array((ss[bs[m]] / ss[bd[m]]) * (1.0 + dl[bd[m]]), pa.float64()),
            }
        )

    got = (
        eds_ds.map_batches(part, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("c", alias_name="s"))
        .to_pandas()
    )
    out = np.zeros(len(d), np.float64)
    if len(got):
        out[got["node"].to_numpy(np.int64)] = got["s"].to_numpy(np.float64)
    return out
