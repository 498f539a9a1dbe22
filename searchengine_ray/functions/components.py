"""Connected components over an edge Dataset — the clustering step of
near-duplicate removal (dup *pairs* → dup *groups* → keep one doc per
group).

Iterative min-label propagation, all Dataset-native:

    label(n) ← min(label(n), min_{(n,m)∈E} label(m))

Each round is one hash-join of the current labels onto the (undirected)
edge list plus a min-groupby — the same partitioning key (node id) every
round, no driver-side state. Rounds needed = component diameter, which
for dedup graphs is tiny (near-dup clusters are cliques-with-whiskers);
``max_iter`` bounds pathological chains. For planet-scale graphs with
long chains the standard fix is alternating small-star/large-star
contraction (halves diameter per round) — the propagation loop below is
the honest baseline and matches it on dedup-shaped inputs.

Convergence is detected with a distributed count of changed labels (a
scalar aggregate), so nothing node-sized ever reaches the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def connected_components(
    edges_ds,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    max_iter: int = 50,
    small_input_edges: int = 100_000,
):
    """Labels for every node that appears in an edge: a Dataset
    (node, cluster) where cluster = min node id of the component.

    Below ``small_input_edges`` the edge list is collapsed to a driver
    union-find (identical output, none of the per-round shuffle fixed
    cost) — dedup pair graphs are usually tiny relative to the corpus
    that produced them; the propagation loop is the path that scales."""
    import ray.data as rd
    from ray.data.aggregate import Min

    n_edges = edges_ds.count()
    if n_edges <= small_input_edges:
        pairs = edges_ds.select_columns([col_a, col_b]).to_pandas()
        out = dedup_clusters(pairs, col_a, col_b)
        return rd.from_pandas(out.rename(columns={"doc_id": "node", "cluster": "label"}))

    def undirect(b: pa.Table) -> pa.Table:
        a = b[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, c]), pa.int64()),
                "dst": pa.array(np.concatenate([c, a]), pa.int64()),
            }
        )

    edges = edges_ds.map_batches(undirect, batch_format="pyarrow")
    # initial label: min neighbor (includes self via the reversed edge
    # min with src below); materialize once — iterated over many times
    labels = (
        edges.groupby("src")
        .aggregate(Min("dst", alias_name="label"))
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["src"],
                    "label": pa.array(
                        np.minimum(
                            b["src"].to_numpy(zero_copy_only=False),
                            b["label"].to_numpy(zero_copy_only=False),
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    edges = edges.materialize()

    # labels only ever decrease, so the (integer) label sum is a strictly
    # monotone potential: fixpoint ⇔ the sum stops moving. That makes the
    # convergence check a scalar aggregate — no outer join against the
    # previous labels (whose empty hash partitions Ray's Arrow join
    # rejects), nothing node-sized on the driver.
    prev_sum = labels.sum("label")
    for _ in range(max_iter):
        # propagate: every edge carries its src's label to dst
        prop = (
            edges.join(labels, join_type="inner", num_partitions=8,
                       on=("src",), right_on=("node",))
            .groupby("dst")
            .aggregate(Min("label", alias_name="cand"))
            .map_batches(
                lambda b: pa.table(
                    {"node": b["dst"], "label": b["cand"].combine_chunks()}
                ),
                batch_format="pyarrow",
            )
        )
        labels = (
            labels.union(prop)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_clusters(pairs_df: pd.DataFrame, col_a: str = "doc_a", col_b: str = "doc_b") -> pd.DataFrame:
    """Small-input convenience: exact clusters from an in-memory pair
    list via union-find (used for oracle-sized results and tests)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df[col_a], pairs_df[col_b]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return pd.DataFrame(
        {"doc_id": nodes, "cluster": [find(n) for n in nodes]}
    ).astype({"doc_id": "int64", "cluster": "int64"})
