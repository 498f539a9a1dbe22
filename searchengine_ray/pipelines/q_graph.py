"""Link-graph pipelines: triangles, HITS, k-core, link prediction.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS


def q_triangle_count(sf_dir: str) -> pd.DataFrame:
    """Graph analytics: triangle count over the same deterministic
    doc-id link graph as ``pagerank`` (degree-oriented wedge check —
    Suri & Vassilvitskii WWW'11 — every stage a Dataset shuffle, the
    driver sees one scalar)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from searchengine_ray.functions.graph import triangle_count

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    edges = np.concatenate(
        [
            np.stack([ids, (ids * 7 + 13) % n], axis=1),
            np.stack([ids, (ids * 31 + 5) % n], axis=1),
            np.stack([ids, ids % 10], axis=1),
        ]
    )
    t = pa.table(
        {
            "src": pa.array(edges[:, 0], pa.int64()),
            "dst": pa.array(edges[:, 1], pa.int64()),
        }
    )
    count = triangle_count(rd.from_arrow(t))
    return pd.DataFrame({"triangles": pd.Series([count], dtype="int64")})

def sql_triangle_count() -> str:
    """Naive id-oriented triangle join — the count is
    orientation-independent, so this verifies the degree-oriented Ray
    path exactly."""
    return """
WITH nn AS (SELECT count(*) AS c FROM documents),
ids AS (SELECT CAST(row_number() OVER () - 1 AS BIGINT) AS id FROM documents),
edges_raw(src, dst) AS (
    SELECT id, (id * 7 + 13) % (SELECT c FROM nn) FROM ids
    UNION ALL SELECT id, (id * 31 + 5) % (SELECT c FROM nn) FROM ids
    UNION ALL SELECT id, id % 10 FROM ids
),
und AS (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM edges_raw WHERE src <> dst
)
SELECT CAST(count(*) AS BIGINT) AS triangles
FROM und e1
JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
"""

HITS_ITERS = 20

def q_hits_scores(sf_dir: str) -> pd.DataFrame:
    """HITS over the same deterministic synthetic doc-id edge set as
    ``q_pagerank`` (Kleinberg's mutual-reinforcement companion to the
    reference's PageRank, ``search/IcsSearchEngine.java:66`` analog).
    Max-normalized per half-step so the distributed result, the numpy
    oracle and the unrolled SQL agree after round(6); fixed
    ``HITS_ITERS`` iterations (no early stop)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..rank.hits import hits_numpy, hits_ray
    from ..sources.links import links_table

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    edges = np.concatenate(
        [
            np.stack([ids, (ids * 7 + 13) % n], axis=1),
            np.stack([ids, (ids * 31 + 5) % n], axis=1),
            np.stack([ids, ids % 10], axis=1),
        ]
    )
    edges = edges[edges[:, 0] != edges[:, 1]]
    if n >= 100_000:
        # broadcast-tier distributed path (see rank/hits.py module doc)
        auth, hub = hits_ray(rd.from_arrow(links_table(edges)), n, HITS_ITERS)
    else:
        auth, hub = hits_numpy(edges, n, HITS_ITERS)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "authority": pd.Series(np.round(auth, 6), dtype="float64"),
            "hub": pd.Series(np.round(hub, 6), dtype="float64"),
        }
    )

def sql_hits_scores() -> str:
    """Unrolled HITS power iteration: per iteration one join+group-by per
    half-step plus a scalar max for the normalization."""
    head = """nn AS (SELECT count(*) AS c FROM documents),
ids AS (SELECT CAST(row_number() OVER () - 1 AS BIGINT) AS id FROM documents),
edges_raw(src, dst) AS (
    SELECT id, (id * 7 + 13) % (SELECT c FROM nn) FROM ids
    UNION ALL SELECT id, (id * 31 + 5) % (SELECT c FROM nn) FROM ids
    UNION ALL SELECT id, id % 10 FROM ids
),
edges AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src <> dst),
h0 AS MATERIALIZED (SELECT id AS node, 1.0 AS val FROM ids)"""
    steps = []
    for i in range(HITS_ITERS):
        steps.append(
            f""",
ar{i + 1} AS MATERIALIZED (
    SELECT i.id AS node, coalesce(s.v, 0.0) AS raw
    FROM ids i LEFT JOIN (
        SELECT e.dst AS node, sum(h.val) AS v
        FROM edges e JOIN h{i} h ON h.node = e.src GROUP BY e.dst
    ) s ON s.node = i.id),
a{i + 1} AS MATERIALIZED (
    SELECT node, raw / (SELECT max(raw) FROM ar{i + 1}) AS val FROM ar{i + 1}),
hr{i + 1} AS MATERIALIZED (
    SELECT i.id AS node, coalesce(s.v, 0.0) AS raw
    FROM ids i LEFT JOIN (
        SELECT e.src AS node, sum(a.val) AS v
        FROM edges e JOIN a{i + 1} a ON a.node = e.dst GROUP BY e.src
    ) s ON s.node = i.id),
h{i + 1} AS MATERIALIZED (
    SELECT node, raw / (SELECT max(raw) FROM hr{i + 1}) AS val FROM hr{i + 1})"""
        )
    return (
        "WITH "
        + head
        + "".join(steps)
        + f"""
SELECT a.node AS doc_id, round(a.val, 6) AS authority, round(h.val, 6) AS hub
FROM a{HITS_ITERS} a JOIN h{HITS_ITERS} h ON h.node = a.node"""
    )

def q_link_prediction(sf_dir: str) -> pd.DataFrame:
    """Common-neighbor link prediction over the hub-free synthetic doc
    graph (the two multiplicative edge formulas WITHOUT the id%10 hub
    edges — wedge fan-out is Σdeg², so the hubbed pagerank graph would
    be quadratic; see functions/graph.py docstring)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from searchengine_ray.functions.graph import common_neighbor_scores
    from searchengine_ray.sources.links import links_table

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    edges = np.concatenate(
        [
            np.stack([ids, (ids * 7 + 13) % n], axis=1),
            np.stack([ids, (ids * 31 + 5) % n], axis=1),
        ]
    )
    edges = edges[edges[:, 0] != edges[:, 1]]
    return common_neighbor_scores(rd.from_arrow(links_table(edges)), top_k=20)

def sql_link_prediction() -> str:
    return """
WITH nn AS (SELECT count(*) AS c FROM documents),
ids AS (SELECT CAST(row_number() OVER () - 1 AS BIGINT) AS id FROM documents),
edges_raw(src, dst) AS (
    SELECT id, (id * 7 + 13) % (SELECT c FROM nn) FROM ids
    UNION ALL SELECT id, (id * 31 + 5) % (SELECT c FROM nn) FROM ids),
canon AS (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM edges_raw WHERE src <> dst),
und AS (SELECT u AS a, v AS b FROM canon UNION ALL SELECT v, u FROM canon),
wed AS (SELECT e1.b AS p, e2.b AS q FROM und e1 JOIN und e2
        ON e1.a = e2.a AND e1.b < e2.b),
cn AS (SELECT p, q, count(*) AS common FROM wed GROUP BY p, q),
pred AS (
    SELECT cn.p, cn.q, cn.common FROM cn
    LEFT JOIN canon ON canon.u = cn.p AND canon.v = cn.q
    WHERE canon.u IS NULL)
SELECT p AS node_a, q AS node_b, common FROM pred
ORDER BY common DESC, p, q LIMIT 20
"""

KCORE_K = 4

KCORE_ITERS = 12

def q_k_core(sf_dir: str) -> pd.DataFrame:
    """k-core decomposition (k=4) of a deterministic quadratic doc graph
    — iterative peeling, a different iterative-graph shape from
    pagerank (fixpoint set shrinkage, not value propagation). The SQL
    oracle unrolls the same fixed rounds; the Ray path asserts the
    fixpoint was reached so both see the converged core."""
    import pyarrow.parquet as pq

    from ..functions.graph import k_core

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    edges = np.concatenate(
        [
            np.stack([ids, (ids * ids + 3) % n], axis=1),
            np.stack([ids, (ids * ids * 7 + ids + 1) % n], axis=1),
            np.stack([ids, (ids * 13 + 17) % n], axis=1),
        ]
    )
    return k_core(edges, n, k=KCORE_K, max_iter=KCORE_ITERS)

def sql_k_core() -> str:
    # every CTE MATERIALIZED: each level references the previous twice,
    # so default inlining expands 2^iters times (and exhausts file
    # handles re-opening the documents view)
    steps = []
    for t in range(1, KCORE_ITERS + 1):
        steps.append(f"""
d{t} AS MATERIALIZED (
  SELECT n AS node, count(*) AS c FROM (
    SELECT e.a AS n FROM e JOIN a{t-1} x ON e.a = x.node JOIN a{t-1} y ON e.b = y.node
    UNION ALL
    SELECT e.b FROM e JOIN a{t-1} x ON e.a = x.node JOIN a{t-1} y ON e.b = y.node
  ) GROUP BY 1),
a{t} AS MATERIALIZED (SELECT node FROM d{t} WHERE c >= {KCORE_K})""")
    chain = ",".join(steps)
    t = KCORE_ITERS
    return f"""
WITH ids AS MATERIALIZED (
  SELECT doc_id AS i, (SELECT count(*) FROM documents) AS n FROM documents),
e0 AS (
  SELECT i AS a, (i * i + 3) % n AS b FROM ids
  UNION ALL SELECT i, (i * i * 7 + i + 1) % n FROM ids
  UNION ALL SELECT i, (i * 13 + 17) % n FROM ids),
e AS MATERIALIZED (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM e0 WHERE a <> b),
a0 AS MATERIALIZED (SELECT i AS node FROM ids),{chain}
SELECT node, CAST(c AS BIGINT) AS deg FROM d{t} JOIN a{t} USING (node)
"""
