"""Similarity / ANN pipelines: brute-force, LSH, IVF, PQ, graph, k-means.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS
from ._common import pa_eq, round_half_away  # noqa: F401


def q_similarity_topk(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..functions.similarity import cosine_topk

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t.filter(pa_eq(t, "vec_id", 0))["embedding"][0].as_py(), dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = cosine_topk(ds, qvec, k=10)
    return out[["vec_id", "cosine"]].astype({"vec_id": "int64"})

LSH_TABLES, LSH_PLANES, LSH_PROBE = 8, 6, 2

def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate nearest neighbours via the Dataset-native
    multi-table LSH index (the scale path next to the exact
    ``similarity_topk`` baseline). Eight 6-plane tables OR-ed together
    with margin-ranked multi-probe (2 flips/table) — the recall shape
    this corpus needs: neighbour cosines are weak (~0.31-0.41), so a
    single table's near buckets miss them (recall 0.1 in round 3, 0.6
    with four tables in round 4, 0.9 with this configuration at ~29%
    candidate fraction, reported per-run by ``bench.py``'s
    ``ann_recall`` block). Since round 5 the index stores each vector
    once with a per-table bucket-list column, so the extra tables cost
    int64s, not vector copies. The planes are a pure function of
    (seed+table, n_planes, dim), so the whole path — bucketing, probe
    set, within-bucket exact cosine — is deterministic and mirrored
    exactly by ``sql_ann_topk``."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..functions.similarity import LshIndex

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t.filter(pa_eq(t, "vec_id", 0))["embedding"][0].as_py(), dtype=np.float64)
    dim = len(qvec)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = LshIndex(dim=dim, n_planes=LSH_PLANES, n_tables=LSH_TABLES)
    idx.build(ds)
    hits = idx.query(qvec, k=10, n_probe=LSH_PROBE)
    return pd.DataFrame(
        {
            "vec_id": pd.Series([i for i, _ in hits], dtype="int64"),
            "cosine": pd.Series([round(s, 6) for _, s in hits], dtype="float64"),
        }
    )

def sql_ann_topk() -> str:
    """Exact SQL mirror of the multi-table margin-probe LSH path (the
    same deterministic-contract trick as ``sql_ivf_topk``'s centroid
    CTEs): each table's plane matrix is a function of (seed=42+table,
    n_planes, dim) only, so the literal values are embedded. Bucket =
    sign-bit integer of the raw dot products per table (positive
    scaling never flips a sign, so normalization is irrelevant to
    bucketing AND to the margin ranking); probe set per table = own
    bucket + flips of the LSH_PROBE planes with the smallest |q·p|
    (ties by plane index — numpy's stable argsort); exact cosine
    top-10 over the distinct probed candidates."""
    rows = ",\n".join(
        f"  ({t}, {p}, [{', '.join(repr(float(x)) for x in np.random.default_rng(42 + t).standard_normal((LSH_PLANES, 64))[p])}]::DOUBLE[])"
        for t in range(LSH_TABLES)
        for p in range(LSH_PLANES)
    )
    return f"""
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
planes(tbl, p, pv) AS (VALUES
{rows}),
b AS MATERIALIZED (
  SELECT planes.tbl, e.vec_id,
         CAST(sum(CASE WHEN list_dot_product(e.v, planes.pv) > 0
                       THEN 1 << planes.p ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN planes GROUP BY planes.tbl, e.vec_id),
qb AS (SELECT tbl, bucket FROM b WHERE vec_id = 0),
margins AS (
  SELECT planes.tbl, planes.p,
         row_number() OVER (PARTITION BY planes.tbl
                            ORDER BY abs(list_dot_product(q.qv, planes.pv)), planes.p) AS rn
  FROM planes CROSS JOIN q),
probes AS (
  SELECT tbl, bucket AS pb FROM qb
  UNION ALL
  SELECT qb.tbl, xor(qb.bucket, CAST(1 << m.p AS BIGINT))
  FROM qb JOIN margins m ON m.tbl = qb.tbl AND m.rn <= {LSH_PROBE}),
cand AS (
  SELECT DISTINCT b.vec_id
  FROM b JOIN probes ON probes.tbl = b.tbl AND probes.pb = b.bucket)
SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
FROM e JOIN cand USING (vec_id) CROSS JOIN q
ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id
LIMIT 10
"""

def _kmeans_ctes(k: int, iters: int) -> str:
    """WITH-clause body mirroring ``functions.vectors.kmeans_fit``
    exactly: first-k-by-id init, L2 argmin with index tie-break,
    per-dim means rounded to 6 digits, empty cluster keeps its
    centroid. MATERIALIZED is mandatory — plain unrolled CTEs explode
    DuckDB's planner (same lesson as the pagerank oracle)."""

    def a_cte(prev_c: str) -> str:
        return f"""
  SELECT vec_id, c FROM (
    SELECT e.vec_id, {prev_c}.c,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.v, {prev_c}.cent), {prev_c}.c) AS rn
    FROM e CROSS JOIN {prev_c}) WHERE rn = 1"""

    def c_cte(a: str, prev_c: str) -> str:
        return f"""
  SELECT {prev_c}.c, coalesce(m.cent, {prev_c}.cent) AS cent
  FROM {prev_c} LEFT JOIN (
    SELECT c, list(x ORDER BY dim) AS cent FROM (
      SELECT {a}.c, u.dim, round(avg(u.val), 6) AS x
      FROM {a} JOIN e USING (vec_id),
           LATERAL (SELECT generate_subscripts(e.v, 1) AS dim, unnest(e.v) AS val) u
      GROUP BY {a}.c, u.dim) GROUP BY c) m USING (c)"""

    parts = [
        "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cent
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT {k}))""",
    ]
    for i in range(1, iters + 1):
        parts.append(f"a{i} AS MATERIALIZED ({a_cte(f'c{i - 1}')})")
        if i < iters:
            parts.append(f"c{i} AS MATERIALIZED ({c_cte(f'a{i}', f'c{i - 1}')})")
    return ",\n".join(parts)

def q_kmeans(sf_dir: str) -> pd.DataFrame:
    """Distributed Lloyd's k-means labelling of the embeddings table —
    the coarse-quantizer trainer (IVF cells, cluster-balance curation).
    Per-pass cost: one map_batches emitting ≤k partial-sum rows per
    batch; labels come back as a Dataset, nothing row-sized touches the
    driver."""
    import ray.data as rd

    from ..functions.vectors import kmeans_fit

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    _cent, labels = kmeans_fit(ds, k=8, iters=3)
    return labels.to_pandas().astype({"vec_id": "int64", "cluster": "int64"})

def sql_kmeans() -> str:
    return f"""
WITH {_kmeans_ctes(8, 3)}
SELECT vec_id, c AS cluster FROM a3
"""

def q_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF (k-means coarse quantizer) ANN — the second scale path.
    Deterministic end-to-end: cells from the distributed ``kmeans_fit``
    (SQL-mirrorable contract), probe = 4 cells nearest the query by
    cosine, exact cosine top-10 within the probed cells — so unlike the
    random-plane LSH path this one has an exact SQL oracle."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..functions.similarity import IvfIndex
    from ..functions.vectors import kmeans_fit

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t.filter(pa_eq(t, "vec_id", 0))["embedding"][0].as_py(), dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cent, _labels = kmeans_fit(ds, k=16, iters=3)
    idx = IvfIndex(n_centroids=16)
    idx.build(ds, centroids=cent)
    hits = idx.query(qvec, k=10, n_probe=4)
    return pd.DataFrame(
        {
            "vec_id": pd.Series([i for i, _ in hits], dtype="int64"),
            "cosine": pd.Series([round(s, 6) for _, s in hits], dtype="float64"),
        }
    )

def sql_ivf_topk() -> str:
    return f"""
WITH {_kmeans_ctes(16, 3)},
q AS MATERIALIZED (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
probes AS MATERIALIZED (
  SELECT c2.c FROM c2 CROSS JOIN q
  ORDER BY list_cosine_similarity(c2.cent, q.qv) DESC, c2.c LIMIT 4)
SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
FROM a3 JOIN e USING (vec_id) CROSS JOIN q
WHERE a3.c IN (SELECT c FROM probes)
ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id
LIMIT 10
"""

def sql_similarity_topk() -> str:
    return """
SELECT e.vec_id, round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id
LIMIT 10
"""

def q_embedding_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label mean embedding (long form): per-batch partial sum
    vectors (one row per label × batch through the shuffle), divide
    once on the aggregated result."""
    import ray.data as rd

    from searchengine_ray.functions.vectors import group_centroids

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    out = group_centroids(emb, "label")
    return out.astype({"label": "int64", "dim": "int64", "c": "float64"})

def sql_embedding_centroids() -> str:
    return """
WITH z AS (
  SELECT label, unnest(embedding)::DOUBLE AS e,
         unnest(range(1, len(embedding)+1)) AS dim
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, dim, round(avg(e), 6) AS c
FROM z GROUP BY label, dim
"""

PQ_M, PQ_KS, PQ_ITERS, PQ_DIM, PQ_RERANK = 2, 16, 2, 64, 100

def q_pq_topk(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN (functions/similarity.py:PqIndex): per-
    subspace codebooks from the distributed deterministic kmeans_fit,
    uint8 codes replace raw vectors, queries score by ADC table lookup
    into a 100-deep shortlist that ONE pruned pass over the raw
    vectors re-ranks exactly (the standard IVF-PQ serving shape —
    recall@10 ~0.8 vs ~0.1 for pure ADC at m=2, reported per-run by
    ``bench.py``'s ``ann_recall`` block). Exact SQL oracle — the whole
    train→encode→ADC→rerank chain is mirrored."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..functions.similarity import PqIndex

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t.filter(pa_eq(t, "vec_id", 0))["embedding"][0].as_py(), dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = PqIndex(m=PQ_M, ks=PQ_KS, iters=PQ_ITERS)
    idx.fit(ds)
    hits = idx.query_rerank(qvec, ds, k=10, rerank=PQ_RERANK)
    return pd.DataFrame(
        {
            "vec_id": pd.Series([i for i, _ in hits], dtype="int64"),
            "cosine": pd.Series([s for _, s in hits], dtype="float64"),
        }
    )

def _pq_ctes() -> str:
    """Per-subspace mirror of ``_kmeans_ctes`` over sliced vectors, plus
    the per-query ADC distance tables."""
    sub = PQ_DIM // PQ_M
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "q AS MATERIALIZED (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)",
    ]
    for s in range(PQ_M):
        lo, hi = s * sub + 1, (s + 1) * sub  # 1-based inclusive slice
        p = f"s{s}"
        parts.append(f"{p}e AS MATERIALIZED (SELECT vec_id, v[{lo}:{hi}] AS v FROM e)")
        parts.append(
            f"""{p}c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cent
  FROM (SELECT * FROM {p}e ORDER BY vec_id LIMIT {PQ_KS}))"""
        )
        for i in range(1, PQ_ITERS + 1):
            prev = f"{p}c{i - 1}"
            parts.append(
                f"""{p}a{i} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT {p}e.vec_id, {prev}.c,
           row_number() OVER (PARTITION BY {p}e.vec_id
                              ORDER BY list_distance({p}e.v, {prev}.cent), {prev}.c) AS rn
    FROM {p}e CROSS JOIN {prev}) WHERE rn = 1)"""
            )
            if i < PQ_ITERS:
                parts.append(
                    f"""{p}c{i} AS MATERIALIZED (
  SELECT {prev}.c, coalesce(m.cent, {prev}.cent) AS cent
  FROM {prev} LEFT JOIN (
    SELECT c, list(x ORDER BY dim) AS cent FROM (
      SELECT {p}a{i}.c, u.dim, round(avg(u.val), 6) AS x
      FROM {p}a{i} JOIN {p}e USING (vec_id),
           LATERAL (SELECT generate_subscripts({p}e.v, 1) AS dim, unnest({p}e.v) AS val) u
      GROUP BY {p}a{i}.c, u.dim) GROUP BY c) m USING (c))"""
                )
        # ADC table: squared L2 between the query slice and each centroid
        last_c = f"{p}c{PQ_ITERS - 1}"
        parts.append(
            f"""{p}t AS MATERIALIZED (
  SELECT {last_c}.c,
         sum((q.qv[{lo - 1} + u.dim] - u.val) * (q.qv[{lo - 1} + u.dim] - u.val)) AS d
  FROM {last_c} CROSS JOIN q,
       LATERAL (SELECT generate_subscripts({last_c}.cent, 1) AS dim, unnest({last_c}.cent) AS val) u
  GROUP BY {last_c}.c)"""
        )
    return ",\n".join(parts)

def sql_pq_topk() -> str:
    joins = " ".join(
        f"JOIN s{s}a{PQ_ITERS} a{s} USING (vec_id) JOIN s{s}t t{s} ON t{s}.c = a{s}.c"
        for s in range(PQ_M)
    )
    adc = " + ".join(f"t{s}.d" for s in range(PQ_M))
    return f"""
WITH {_pq_ctes()},
short AS (
  SELECT e.vec_id
  FROM e {joins}
  ORDER BY {adc}, e.vec_id
  LIMIT {PQ_RERANK})
SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
FROM e JOIN short USING (vec_id) CROSS JOIN q
ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id
LIMIT 10
"""

def q_embedding_outliers(sf_dir: str) -> pd.DataFrame:
    """Mislabel detection: cosine of every embedding to its OWN label
    centroid; the global bottom-10 are the most atypical members. The
    centroid table (labels × dim) comes from the one-shuffle combiner
    and broadcasts into a vectorized scoring scan with per-block
    partial bottom-k — the data-QA pass before training on labels."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..functions.vectors import group_centroids

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )
    cents = group_centroids(ds, "label")
    cmat = {
        int(lbl): g.sort_values("dim")["c"].to_numpy(np.float64)
        for lbl, g in cents.groupby("label")
    }
    ref = ray.put(cmat)

    def score(b: pa.Table, _r=ref) -> pa.Table:
        cm = ray.get(_r)
        emb = b["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // max(len(b), 1) if len(b) else 0
        m = flat.reshape(-1, dim) if len(b) else np.zeros((0, 0))
        lbl = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        cen = np.stack([cm[int(x)] for x in lbl]) if len(b) else np.zeros((0, 0))
        num = (m * cen).sum(axis=1)
        den = np.linalg.norm(m, axis=1) * np.linalg.norm(cen, axis=1)
        cos = np.round(num / np.maximum(den, 1e-300), 6)
        t = pa.table(
            {
                "vec_id": b["vec_id"].cast(pa.int64()),
                "label": pa.array(lbl, pa.int64()),
                "cosine": pa.array(cos, pa.float64()),
            }
        )
        order = np.lexsort((t["vec_id"].to_numpy(zero_copy_only=False), cos))[:10]
        return t.take(pa.array(np.sort(order)))

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["cosine", "vec_id"], ascending=[True, True]).head(10)
    return out.reset_index(drop=True).astype(
        {"vec_id": "int64", "label": "int64", "cosine": "float64"}
    )

def sql_embedding_outliers() -> str:
    return """
WITH z AS (
  SELECT label, u.i AS dim, u.v AS x
  FROM embeddings,
       LATERAL (SELECT unnest(range(len(embedding))) AS i,
                       unnest(CAST(embedding AS DOUBLE[])) AS v) u),
cent AS (
  SELECT label, dim, round(avg(x), 6) AS c FROM z GROUP BY 1, 2),
cl AS (
  SELECT label, list(c ORDER BY dim) AS cv FROM cent GROUP BY label)
SELECT e.vec_id, e.label,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cl.cv), 6) AS cosine
FROM embeddings e JOIN cl USING (label)
ORDER BY cosine, vec_id LIMIT 10
"""

def q_dense_topk(sf_dir: str) -> pd.DataFrame:
    """WITH TIES top-k: customers holding the top-2 DISTINCT rounded
    account balances per nation (dense_rank ≤ 2 — every tied row
    surfaces, unlike `group_topk`'s row_number cut). Per-batch partial:
    keep rows whose balance is among the batch's top-2 distinct values
    per nation (a superset of the global answer), then one small
    groupby finalize. Monotone-safe combiner: the global top-2 distinct
    values are each batch-local top-2 somewhere."""
    import pyarrow as pa
    import ray.data as rd

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "c_nationkey": b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "bal": np.round(
                    b["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64), 0
                ),
            }
        )
        keep = []
        for _, sub in df.groupby("c_nationkey"):
            top2 = np.sort(sub["bal"].unique())[::-1][:2]
            keep.append(sub[sub["bal"].isin(top2)])
        out = pd.concat(keep) if keep else df.iloc[:0]
        return pa.Table.from_pandas(out, preserve_index=False)

    cand = (
        rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    keep = []
    for _, sub in cand.groupby("c_nationkey"):
        top2 = np.sort(sub["bal"].unique())[::-1][:2]
        sub = sub[sub["bal"].isin(top2)].copy()
        rank_map = {v: i + 1 for i, v in enumerate(top2)}
        sub["rnk"] = sub["bal"].map(rank_map).astype(np.int64)
        keep.append(sub)
    out = pd.concat(keep).sort_values(["c_nationkey", "rnk", "c_custkey"])
    return out[["c_nationkey", "c_custkey", "bal", "rnk"]].reset_index(drop=True).astype(
        {"c_nationkey": "int64", "c_custkey": "int64", "rnk": "int64"}
    )

def sql_dense_topk() -> str:
    return """
WITH r AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey,
         round(c_acctbal, 0) AS bal,
         dense_rank() OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal, 0) DESC) AS rnk
  FROM customer)
SELECT c_nationkey, c_custkey, bal, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 2
"""

MMR_K = 5

MMR_LAMBDA = 0.7

MMR_POOL = 20

def q_mmr_diversify(sf_dir: str) -> pd.DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    SIGIR'98): from the top-{POOL} cosine candidates for query vec 0,
    greedily pick {K} results maximizing λ·rel − (1−λ)·max-sim-to-
    selected — the diversity-aware retrieval layer over the exact
    ``similarity_topk`` baseline. Relevance and pairwise sims are
    rounded to 6dp BEFORE the greedy loop (ties by vec_id), so the
    argmax sequence is reproducible bit-for-bit by the SQL unroll. The
    candidate fetch is the distributed top-k; the greedy runs on the
    {POOL}-row pool."""
    import pyarrow.parquet as pq

    from ..functions.similarity import cosine_topk

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t.filter(pa_eq(t, "vec_id", 0))["embedding"][0].as_py(), np.float64)
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    top = cosine_topk(ds, qvec, k=MMR_POOL + 12)
    # re-rank on the rounded score with vec_id ties, then keep the pool
    top = top.sort_values(["cosine", "vec_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    assert top["cosine"].iloc[MMR_POOL + 5] < top["cosine"].iloc[MMR_POOL - 1], (
        "rounded-score tie spans the pool boundary; enlarge the fetch"
    )
    pool = top.head(MMR_POOL)
    ids = pool["vec_id"].to_numpy(np.int64)
    rel = pool["cosine"].to_numpy(np.float64)

    sub = t.filter(pa_isin(t, "vec_id", ids))
    sids = np.asarray(sub["vec_id"].to_pylist(), np.int64)
    vecs = np.stack([np.asarray(v, np.float64) for v in sub["embedding"].to_pylist()])
    vecs = vecs[np.argsort(sids)][np.argsort(np.argsort(ids))]
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = np.asarray(round_half_away(norm @ norm.T, 6), np.float64)

    chosen: list[int] = []
    rows = []
    avail = np.ones(len(ids), bool)
    for rank in range(1, MMR_K + 1):
        if chosen:
            penalty = sims[:, chosen].max(axis=1)
        else:
            penalty = np.zeros(len(ids))
        score = MMR_LAMBDA * rel - (1.0 - MMR_LAMBDA) * penalty
        score[~avail] = -np.inf
        best = min(
            (int(i) for i in np.flatnonzero(score == score.max())),
            key=lambda i: int(ids[i]),
        )
        rows.append((rank, int(ids[best]), float(round_half_away(score[best], 6))))
        chosen.append(best)
        avail[best] = False
    return pd.DataFrame(rows, columns=["rank", "vec_id", "mmr"]).astype(
        {"rank": "int64", "vec_id": "int64"}
    )

def pa_isin(t, col, vals):
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.is_in(t[col], value_set=pa.array(np.asarray(vals, np.int64), pa.int64()))

def sql_mmr_diversify() -> str:
    lam, om = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    stages = [
        "sel0(vec_id, mmr) AS (SELECT vec_id, rel FROM cand "
        "ORDER BY rel DESC, vec_id LIMIT 1)"
    ]
    for k in range(2, MMR_K + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT vec_id FROM sel{i}" for i in range(k - 1)
        )
        stages.append(
            f"""sel{k - 1}(vec_id, mmr) AS (
    SELECT c.vec_id,
           {lam} * c.rel - {om} * (
               SELECT max(s.s) FROM sim s
               WHERE s.a = c.vec_id AND s.b IN ({sel_union})) AS mmr
    FROM cand c WHERE c.vec_id NOT IN ({sel_union})
    ORDER BY mmr DESC, c.vec_id LIMIT 1)"""
        )
    sel_all = "\nUNION ALL ".join(
        f"SELECT {i + 1} AS rank, vec_id, round({lam} * (SELECT rel FROM cand WHERE cand.vec_id = sel{i}.vec_id), 6) AS mmr FROM sel{i}"
        if i == 0
        else f"SELECT {i + 1}, vec_id, round(mmr, 6) FROM sel{i}"
        for i in range(MMR_K)
    )
    stage_sql = ",\n".join(stages)
    return f"""
WITH e AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v FROM e WHERE vec_id = 0),
cand AS MATERIALIZED (
    SELECT e.vec_id, round(list_cosine_similarity(e.v, q.v), 6) AS rel
    FROM e CROSS JOIN q
    ORDER BY rel DESC, e.vec_id LIMIT {MMR_POOL}),
sim AS MATERIALIZED (
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(ea.v, eb.v), 6) AS s
    FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id),
{stage_sql}
SELECT rank, vec_id, mmr FROM ({sel_all}) ORDER BY rank
"""

MUTUAL_TOPK = 10

def q_mutual_knn(sf_dir: str) -> pd.DataFrame:
    """Reciprocal best-match pairs over the embedding table: a and b
    match when each is the other's cosine nearest neighbor — the
    high-precision alignment primitive (bilingual lexicon induction,
    record linkage) that cuts hubness false-positives one-directional
    NN suffers. Neighbor ranks use the (6dp cosine DESC, vec_id ASC)
    quantize-then-rank contract; scoring is batched matmuls against
    the broadcast matrix. Output: the {K} strongest mutual pairs plus
    the global mutual count."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    emb = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = emb["vec_id"].to_numpy(np.int64)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norm = np.sqrt((mat * mat).sum(axis=1))
    ref = ray.put((mat, ids, norm))

    def best(b: pa.Table) -> pa.Table:
        m, allid, nn = ray.get(ref)
        x = np.stack(b["embedding"].to_pandas().to_numpy()).astype(np.float64)
        xid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        xn = np.sqrt((x * x).sum(axis=1))
        cos = (x @ m.T) / np.outer(xn, nn)
        cos_q = np.asarray(round_half_away(cos, 6), np.float64)
        # mask self-matches, then argbest by (cos DESC, id ASC)
        self_mask = xid[:, None] == allid[None, :]
        cos_q[self_mask] = -2.0
        nbr = np.empty(len(x), np.int64)
        ncs = np.empty(len(x), np.float64)
        for i in range(len(x)):
            j = np.lexsort((allid, -cos_q[i]))[0]
            nbr[i] = allid[j]
            ncs[i] = cos_q[i][j]
        return pa.table(
            {
                "vec_id": pa.array(xid, pa.int64()),
                "nbr": pa.array(nbr, pa.int64()),
                "cos": pa.array(ncs, pa.float64()),
            }
        )

    nn_tbl = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(best, batch_format="pyarrow")
        .to_pandas()
    )
    m = dict(zip(nn_tbl["vec_id"], nn_tbl["nbr"]))
    cosd = dict(zip(nn_tbl["vec_id"], nn_tbl["cos"]))
    pairs = []
    for a, bb in m.items():
        if a < bb and m.get(bb) == a:
            pairs.append((int(a), int(bb), float(cosd[a])))
    n_mutual = len(pairs)
    pairs.sort(key=lambda r: (-r[2], r[0]))
    out = pd.DataFrame(
        pairs[:MUTUAL_TOPK], columns=["vec_a", "vec_b", "cosine"]
    )
    out["n_mutual"] = n_mutual
    return out.astype({"vec_a": "int64", "vec_b": "int64", "n_mutual": "int64"})

def sql_mutual_knn() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         round(list_cosine_similarity(a.v, b.v), 6) AS c
  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
best AS (
  SELECT ia, ib, c FROM (
    SELECT ia, ib, c,
           row_number() OVER (PARTITION BY ia ORDER BY c DESC, ib) AS rn
    FROM pairs) WHERE rn = 1),
mut AS (
  SELECT x.ia AS vec_a, x.ib AS vec_b, x.c AS cosine
  FROM best x JOIN best y ON x.ib = y.ia AND y.ib = x.ia
  WHERE x.ia < x.ib),
nm AS (SELECT count(*) AS n FROM mut)
SELECT vec_a, vec_b, cosine, CAST(nm.n AS BIGINT) AS n_mutual
FROM mut, nm
ORDER BY cosine DESC, vec_a LIMIT {MUTUAL_TOPK}
"""

GRAPH_ANN_STRIDE = 11

GRAPH_ANN_M = 6

GRAPH_ANN_QUERIES = [1, 2, 3]

GRAPH_ANN_MAXSTEPS = 50

def q_graph_ann(sf_dir: str) -> pd.DataFrame:
    """Navigable-graph greedy ANN (the single-layer HNSW idea): graph
    nodes are the vec_id % {GRAPH_ANN_STRIDE} == 0 subset, each node's
    out-edges are its exact top-{GRAPH_ANN_M} cosine neighbors (built
    DISTRIBUTED — per-batch matmul against the broadcast subset
    matrix; similarities quantized to integer micro-units so every
    comparison is exact in both engines), and search greedily walks
    from entry node (min vec_id) to the neighbor with the best
    quantized similarity to the query until no neighbor improves.
    Emits hops, final node, its similarity, the true exact top-1 and
    whether greedy found it (local optima honestly flagged — the
    reason real HNSW adds layers and beam width)."""
    import pyarrow as pa
    import ray.data as rd

    def load_vec(ids_filter):
        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        if ids_filter is not None:
            ds = ds.filter(ids_filter)
        t = ds.to_pandas().sort_values("vec_id")
        ids = t["vec_id"].to_numpy(np.int64)
        mat = np.vstack(t["embedding"].to_numpy()).astype(np.float64)
        return ids, mat

    sub_ids, sub_mat = load_vec(lambda r: r["vec_id"] % GRAPH_ANN_STRIDE == 0)
    sub_n = sub_mat / np.linalg.norm(sub_mat, axis=1, keepdims=True)
    import ray as _ray

    sub_ref = _ray.put((sub_ids, sub_n))

    def edges(b: pa.Table) -> pa.Table:
        ids_all, nrm = _ray.get(sub_ref)
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = vid % GRAPH_ANN_STRIDE == 0
        if not keep.any():
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.int64()),
                }
            )
        col = b["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(len(b), -1)[keep]
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = np.asarray(
            round_half_away(1e6 * (mat @ nrm.T), 0), np.int64
        )  # rows × subset
        src = vid[keep]
        out_s, out_d, out_m = [], [], []
        for i, s in enumerate(src):
            row = sims[i].copy()
            row[ids_all == s] = np.iinfo(np.int64).min  # no self-loop
            order = np.lexsort((ids_all, -row))[:GRAPH_ANN_M]
            out_s.extend([s] * len(order))
            out_d.extend(ids_all[order])
            out_m.extend(row[order])
        return pa.table(
            {
                "src": pa.array(np.asarray(out_s, np.int64), pa.int64()),
                "dst": pa.array(np.asarray(out_d, np.int64), pa.int64()),
                "sim": pa.array(np.asarray(out_m, np.int64), pa.int64()),
            }
        )

    etab = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(edges, batch_format="pyarrow")
        .to_pandas()
    )
    nbrs: dict[int, list[int]] = {}
    for s, d in zip(etab["src"].astype(int), etab["dst"].astype(int)):
        nbrs.setdefault(s, []).append(d)

    q_ids, q_mat = load_vec(
        lambda r: r["vec_id"] in GRAPH_ANN_QUERIES  # noqa: B023
    )
    q_n = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    qsims = np.asarray(round_half_away(1e6 * (q_n @ sub_n.T), 0), np.int64)
    pos = {int(v): i for i, v in enumerate(sub_ids)}
    entry = int(sub_ids.min())

    rows = []
    for qi, qid in enumerate(int(v) for v in q_ids):
        sim_of = qsims[qi]
        cur, steps = entry, 0
        for _ in range(GRAPH_ANN_MAXSTEPS):
            cand = nbrs.get(cur, [])
            if not cand:
                break
            best = min(cand, key=lambda d: (-sim_of[pos[d]], d))
            if sim_of[pos[best]] > sim_of[pos[cur]]:
                cur, steps = best, steps + 1
            else:
                break
        order = np.lexsort((sub_ids, -sim_of))
        exact = int(sub_ids[order[0]])
        rows.append(
            (
                qid,
                steps,
                cur,
                int(sim_of[pos[cur]]),
                exact,
                int(cur == exact),
            )
        )
    return pd.DataFrame(
        rows, columns=["qid", "steps", "final_id", "final_sim", "exact_top", "hit"]
    ).astype({c: "int64" for c in ["qid", "steps", "final_id", "final_sim", "exact_top", "hit"]})

def sql_graph_ann() -> str:
    S, M, T = GRAPH_ANN_STRIDE, GRAPH_ANN_M, GRAPH_ANN_MAXSTEPS
    qlist = ", ".join(str(q) for q in GRAPH_ANN_QUERIES)
    return f"""
WITH RECURSIVE ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings),
nrm AS (SELECT vec_id, sqrt(sum(e * e)) AS nm FROM ex GROUP BY vec_id),
un AS (SELECT ex.vec_id, ex.i, ex.e / nrm.nm AS e
       FROM ex JOIN nrm USING (vec_id)),
sub AS (SELECT * FROM un WHERE vec_id % {S} = 0),
simsub AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         CAST(round(1e6 * sum(a.e * b.e), 0) AS BIGINT) AS sim
  FROM sub a JOIN sub b USING (i)
  WHERE a.vec_id <> b.vec_id
  GROUP BY 1, 2),
edges AS (
  SELECT src, dst, sim FROM (
    SELECT src, dst, sim,
           row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS r
    FROM simsub) WHERE r <= {M}),
qv AS (SELECT * FROM un WHERE vec_id IN ({qlist})),
qsim AS (
  SELECT q.vec_id AS qid, s.vec_id AS node,
         CAST(round(1e6 * sum(q.e * s.e), 0) AS BIGINT) AS sim
  FROM qv q JOIN sub s USING (i)
  GROUP BY 1, 2),
entry AS (SELECT min(vec_id) AS v FROM (SELECT DISTINCT vec_id FROM sub)),
walk(qid, cur, cursim, steps) AS (
  SELECT qs.qid, e.v, qs.sim, 0
  FROM entry e JOIN qsim qs ON qs.node = e.v
  UNION ALL
  SELECT w.qid, nb.node, nb.sim, w.steps + 1
  FROM walk w, LATERAL (
    SELECT q2.node, q2.sim
    FROM edges ed JOIN qsim q2 ON q2.qid = w.qid AND q2.node = ed.dst
    WHERE ed.src = w.cur
    ORDER BY q2.sim DESC, q2.node LIMIT 1) nb
  WHERE w.steps < {T} AND nb.sim > w.cursim),
fin AS (
  SELECT qid, cur, cursim, steps,
         row_number() OVER (PARTITION BY qid ORDER BY steps DESC) AS r
  FROM walk),
exact AS (
  SELECT qid, node AS exact_top,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, node) AS r
  FROM qsim)
SELECT f.qid, CAST(f.steps AS BIGINT) AS steps, f.cur AS final_id,
       f.cursim AS final_sim, e.exact_top,
       CAST(CASE WHEN f.cur = e.exact_top THEN 1 ELSE 0 END AS BIGINT) AS hit
FROM fin f JOIN exact e ON e.qid = f.qid AND e.r = 1
WHERE f.r = 1
ORDER BY f.qid
"""

FANN_QUERIES = [1, 2, 3]

FANN_K = 5

def q_filtered_ann(sf_dir: str) -> pd.DataFrame:
    """Filtered vector search (the vector-DB feature everyone asks
    for: top-k among vectors with label == L): per query vector, the
    PRE-FILTER exact answer (cosine top-{FANN_K} within the query's
    own label class) plus the POST-FILTER overfetch audit — how deep
    into the UNFILTERED ranking you must go to collect {FANN_K}
    matches (the overfetch factor a post-filtering engine must tune).
    Scores rank at 6dp with doc ties; one scan per batch against the
    broadcast query matrix."""
    import pyarrow as pa
    import ray.data as rd

    qset = set(FANN_QUERIES)
    emb = (
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
        )
        .filter(lambda r: r["vec_id"] in qset)  # noqa: B023
        .to_pandas()
        .set_index("vec_id")
        .loc[list(FANN_QUERIES)]
    )
    # driver holds only the q-sized query block; the scan below is the
    # distributed corpus pass (broadcast queries, per-batch matmul)
    qm = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    qlab = emb["label"].to_numpy(np.int64)

    import ray as _ray

    qref = _ray.put((qn, qlab))

    def scan(b: pa.Table) -> pa.Table:
        qn_, qlab_ = _ray.get(qref)
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = b["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(b), -1)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.asarray(round_half_away(m @ qn_.T, 6), np.float64)
        out_q, out_id, out_lab, out_s = [], [], [], []
        for qi in range(len(qn_)):
            s = sims[:, qi]
            keep = vid != FANN_QUERIES[qi]
            # local partial: top (K + generous margin) overall
            order = np.lexsort((vid[keep], -s[keep]))[: 50 * FANN_K]
            out_q.extend([qi] * len(order))
            out_id.extend(vid[keep][order])
            out_lab.extend(lab[keep][order])
            out_s.extend(s[keep][order])
        return pa.table(
            {
                "qi": pa.array(np.asarray(out_q, np.int64), pa.int64()),
                "vec_id": pa.array(np.asarray(out_id, np.int64), pa.int64()),
                "label": pa.array(np.asarray(out_lab, np.int64), pa.int64()),
                "sim": pa.array(np.asarray(out_s, np.float64), pa.float64()),
            }
        )

    parts = (
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
        )
        .map_batches(scan, batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for qi, q in enumerate(FANN_QUERIES):
        g = parts[parts["qi"] == qi].sort_values(
            ["sim", "vec_id"], ascending=[False, True]
        )
        filt = g[g["label"] == qlab[qi]].head(FANN_K)
        # overfetch depth: global rank of the K-th filtered hit
        hit_ranks = np.flatnonzero(
            (g["label"] == qlab[qi]).to_numpy()
        )[:FANN_K]
        depth = int(hit_ranks[-1] + 1) if len(hit_ranks) >= FANN_K else len(g)
        for r, (_, row) in enumerate(filt.iterrows(), start=1):
            rows.append(
                (
                    q,
                    int(qlab[qi]),
                    r,
                    int(row["vec_id"]),
                    float(row["sim"]),
                    depth,
                    float(round_half_away(depth / FANN_K, 6)),
                )
            )
    return pd.DataFrame(
        rows,
        columns=["qid", "label", "rank", "vec_id", "sim", "overfetch_depth", "overfetch_factor"],
    ).astype(
        {c: "int64" for c in ["qid", "label", "rank", "vec_id", "overfetch_depth"]}
    )

def sql_filtered_ann() -> str:
    qlist = ", ".join(str(q) for q in FANN_QUERIES)
    K = FANN_K
    return f"""
WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings),
nrm AS (SELECT vec_id, sqrt(sum(e * e)) AS nm FROM ex GROUP BY vec_id),
un AS (SELECT ex.vec_id, ex.label, ex.i, ex.e / nrm.nm AS e
       FROM ex JOIN nrm USING (vec_id)),
qv AS (SELECT * FROM un WHERE vec_id IN ({qlist})),
sims AS (
  SELECT q.vec_id AS qid, q.label AS qlab, s.vec_id, s.label,
         round(sum(q.e * s.e), 6) AS sim
  FROM qv q JOIN un s ON s.i = q.i AND s.vec_id <> q.vec_id
  GROUP BY 1, 2, 3, 4),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS gr
  FROM sims),
filt AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS fr
  FROM ranked WHERE label = qlab),
depth AS (
  SELECT qid, max(gr) AS d FROM filt WHERE fr <= {K} GROUP BY qid)
SELECT f.qid, CAST(f.qlab AS BIGINT) AS label, CAST(f.fr AS BIGINT) AS rank,
       f.vec_id, f.sim,
       CAST(d.d AS BIGINT) AS overfetch_depth,
       round(d.d * 1.0 / {K}, 6) AS overfetch_factor
FROM filt f JOIN depth d USING (qid)
WHERE f.fr <= {K}
ORDER BY f.qid, f.fr
"""
