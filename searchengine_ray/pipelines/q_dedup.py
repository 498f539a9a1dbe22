"""Deduplication pipelines: exact, MinHash-LSH, SimHash, n-gram, embedding, CDC.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS
from ._common import CHUNK_STRIDE, CHUNK_W, _chunk_batch, _raw_tokens_cte, round_half_away  # noqa: F401


def q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from ..functions.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()
    return out.astype({"doc_id": "int64", "n_dups": "int64"}).sort_values("doc_id").reset_index(drop=True)

def sql_dedup_exact() -> str:
    return "SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM documents GROUP BY text"

def q_dedup_minhash(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from ..functions.dedup import minhash_dedup_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_dedup_pairs(ds, threshold=0.5)

def sql_dedup_minhash() -> str:
    """All-pairs exact 3-shingle Jaccard ≥ 0.5 — equals the LSH+verify
    output when banded LSH (16 bands × 8 rows) recalls every pair at the
    threshold; on this corpus all true pairs sit at j ≥ 0.9 where miss
    probability is ≈1e-4, and the seed is fixed, so the match is
    deterministic (verified at sf0.001/sf0.01)."""
    return r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                          '[ \t\n\x0b\f\r]+'), t -> t <> '') AS ts
    FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(ts) = 0 THEN []
                WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                ELSE list_transform(range(1, len(ts) - 1),
                                    i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))
           END AS shingles
    FROM toks
), sets AS (
    SELECT doc_id, list_distinct(shingles) AS s FROM sh
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CASE WHEN len(a.s) = 0 AND len(b.s) = 0 THEN 1.0
                  ELSE len(list_intersect(a.s, b.s))
                       / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
             END, 6) AS jaccard
FROM sets a JOIN sets b ON a.doc_id < b.doc_id
WHERE CASE WHEN len(a.s) = 0 AND len(b.s) = 0 THEN 1.0
           ELSE len(list_intersect(a.s, b.s))
                / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
      END >= 0.5
"""

def q_dedup_ngram(sf_dir: str) -> pd.DataFrame:
    """Exact n-gram-Jaccard near-dup pairs — the oracle-exact baseline
    beside the approximate paths (``dedup_minhash`` LSH recall,
    ``dedup_simhash`` Hamming blocking): a distributed shingle inverted
    index whose per-pair shared-shingle row count IS the intersection
    size. Same output contract as ``dedup_minhash``."""
    import ray.data as rd

    from ..functions.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold=0.5)

def sql_dedup_ngram() -> str:
    """All-pairs exact 3-shingle Jaccard ≥ 0.5 — the Ray path is exact
    (no LSH recall caveat), so this oracle is an identity, not an
    approximation bound."""
    return sql_dedup_minhash()

def q_dedup_simhash(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from ..functions.dedup import simhash_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)

def sql_dedup_simhash() -> str:
    """Exact SimHash recomputation: the engine's token hash is DuckDB's
    ``md5_number_lower`` by construction (``_md5_hash_lists``), so the
    oracle rebuilds every 64-bit signature bit-for-bit and emits all
    pairs at Hamming ≤ 3 — equal to the engine's banded-LSH output
    because 4×16-bit bands recall *every* pair within Hamming ≤ 3
    (pigeonhole), and the verify step filters to the same bound."""
    return r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                          '[ \t\n\x0b\f\r]+'), t -> t <> '') AS ts
    FROM documents
), tf AS (
    SELECT doc_id, token, count(*) AS w
    FROM (SELECT doc_id, unnest(ts) AS token FROM toks)
    GROUP BY doc_id, token
), bitacc AS (
    SELECT doc_id, i.range AS bit,
           sum(CASE WHEN (md5_number_lower(token) >> i.range) & 1 = 1
                    THEN w ELSE -w END) AS acc
    FROM tf, range(64) i
    GROUP BY doc_id, i.range
), sig0 AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN acc > 0 THEN CAST(1 AS UBIGINT) << CAST(bit AS INT)
                         ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sig
    FROM bitacc GROUP BY doc_id
), sigs AS (
    SELECT d.doc_id, coalesce(s.sig, CAST(0 AS UBIGINT)) AS sig
    FROM documents d LEFT JOIN sig0 s USING (doc_id)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
ORDER BY doc_a, doc_b
"""

def q_embedding_neardup(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from ..functions.dedup import embedding_neardup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_neardup_pairs(ds, threshold=0.45)

def sql_embedding_neardup() -> str:
    return """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45
"""

def q_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs → connected components → (doc_id, cluster):
    the clustering step that turns pairwise dedup output into
    keep-one-per-group decisions. Pairs come from the exact shingle
    inverted index (``dedup_ngram``); components run as iterative
    min-label propagation over the edge Dataset (one hash-join + one
    min-groupby per round, diameter-bounded)."""
    import ray.data as rd

    from searchengine_ray.functions.components import connected_components
    from searchengine_ray.functions.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, threshold=0.5)
    if len(pairs) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "cluster": pd.Series([], dtype="int64")})
    edges = rd.from_pandas(pairs[["doc_a", "doc_b"]])
    out = connected_components(edges).to_pandas()
    out = out.rename(columns={"node": "doc_id", "label": "cluster"})
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "cluster": "int64"}
    )

def sql_dedup_clusters() -> str:
    """Recursive min-label reachability over the same exact-Jaccard pair
    set the Ray path clusters (UNION-dedup makes the CTE terminate)."""
    pairs_sql = sql_dedup_minhash().strip()
    assert pairs_sql.startswith("WITH")
    body = pairs_sql[len("WITH"):]
    ctes, select = body.split("SELECT a.doc_id", 1)
    return f"""
WITH RECURSIVE {ctes}, pairs AS (
SELECT a.doc_id{select}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), reach(n, l) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.l FROM edges e JOIN reach r ON r.n = e.b
)
SELECT n AS doc_id, min(l) AS cluster FROM reach GROUP BY n
"""

def q_dedup_keep_best(sf_dir: str) -> pd.DataFrame:
    """The real near-dup curation decision: clusters (exact-Jaccard
    pairs → connected components) × quality scores → keep the
    highest-quality doc per cluster (tie → lowest doc_id). Selection
    runs as a distributed hash join of the cluster table onto the
    quality table plus a group_topk(k=1) — nothing cluster-sized on the
    driver beyond the final (cluster, kept) result."""
    import pyarrow as pa
    import ray.data as rd

    from searchengine_ray.functions.components import connected_components
    from searchengine_ray.functions.dedup import ngram_jaccard_pairs
    from searchengine_ray.functions.sampling import group_topk
    from searchengine_ray.functions.textstats import quality_score_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, threshold=0.5)
    if len(pairs) == 0:
        return pd.DataFrame(
            {"cluster": pd.Series([], dtype="int64"),
             "kept_doc": pd.Series([], dtype="int64"),
             "n_members": pd.Series([], dtype="int64")}
        )
    comp = connected_components(rd.from_pandas(pairs[["doc_a", "doc_b"]])).map_batches(
        lambda b: pa.table(
            {"doc_id": b["node"].cast(pa.int64()), "cluster": b["label"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    qual = ds.map_batches(quality_score_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "quality"]
    )
    joined = comp.join(qual, join_type="inner", num_partitions=8, on=("doc_id",))
    best = group_topk(joined, "cluster", "quality", "doc_id", k=1).to_pandas()
    sizes = comp.to_pandas().groupby("cluster").size().rename("n_members")
    out = (
        best.merge(sizes, left_on="cluster", right_index=True)
        .rename(columns={"doc_id": "kept_doc"})
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    return out[["cluster", "kept_doc", "n_members"]].astype(
        {"cluster": "int64", "kept_doc": "int64", "n_members": "int64"}
    )

def sql_dedup_keep_best() -> str:
    clusters_sql = sql_dedup_clusters().strip()
    assert clusters_sql.startswith("WITH RECURSIVE")
    body = clusters_sql[len("WITH RECURSIVE"):]
    ctes, select = body.rsplit("SELECT n AS doc_id", 1)
    return f"""
WITH RECURSIVE {ctes.rstrip()}, clusters AS (
SELECT n AS doc_id{select}
),
{_raw_tokens_cte()},
qual AS (
  SELECT p.doc_id,
         round(0.4 * (p.n_stop / greatest(p.n_tokens, 1.0))
               + 0.4 * least(1.0, p.n_tokens / 100.0)
               + 0.2 * (1.0 - (length(d.text) - length(regexp_replace(d.text, '[,.;?!]', '', 'g')))
                              / greatest(length(d.text), 1.0)), 6) AS quality
  FROM per_doc p JOIN documents d USING (doc_id)),
sel AS (
  SELECT c.cluster, c.doc_id, q.quality,
         count(*) OVER (PARTITION BY c.cluster) AS n_members,
         row_number() OVER (PARTITION BY c.cluster
                            ORDER BY q.quality DESC, c.doc_id) AS rn
  FROM clusters c JOIN qual q USING (doc_id))
SELECT cluster, doc_id AS kept_doc, n_members FROM sel WHERE rn = 1
"""

def q_containment_dedup(sf_dir: str) -> pd.DataFrame:
    """Asymmetric shingle containment |A∩B|/|A| ≥ 0.8 — the
    doc-inside-doc detector (quoted articles, boilerplate wrappers,
    truncated mirrors) that symmetric Jaccard misses. Shares the
    distributed shingle-inverted-index machinery with ``dedup_ngram``;
    directed output."""
    import ray.data as rd

    from ..functions.dedup import ngram_containment_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_containment_pairs(ds, threshold=0.8)

def sql_containment_dedup() -> str:
    return r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                          '[ \t\n\x0b\f\r]+'), t -> t <> '') AS ts
    FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(ts) = 0 THEN []
                WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                ELSE list_transform(range(1, len(ts) - 1),
                                    i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))
           END AS shingles
    FROM toks
), ne AS (
    SELECT doc_id, list_distinct(shingles) AS s FROM sh WHERE len(shingles) > 0
)
SELECT contained, container, round(containment, 6) AS containment FROM (
  SELECT a.doc_id AS contained, b.doc_id AS container,
         len(list_intersect(a.s, b.s)) / CAST(len(a.s) AS DOUBLE) AS containment
  FROM ne a JOIN ne b ON a.doc_id <> b.doc_id)
WHERE containment >= 0.8
"""

def q_nearest_dup(sf_dir: str) -> pd.DataFrame:
    """Per-doc nearest-duplicate report: for every doc that shares any
    shingle with another, its single best match by exact Jaccard
    (tie → lowest partner id). Built on the same shingle-inverted-index
    pair counts as dedup_ngram, finished with a per-doc argmax — the
    human-reviewable 'what would dedup delete' audit table."""
    import pyarrow as pa
    import ray.data as rd

    from ..functions.dedup import _shingle_pair_counts
    from ..functions.sampling import group_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    counted = _shingle_pair_counts(ds, 3, "text")

    def directed(b: pa.Table) -> pa.Table:
        pair = b["pair"].to_numpy(zero_copy_only=False)
        c = b["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
        sa = b["min(sa)"].to_numpy(zero_copy_only=False).astype(np.float64)
        sb = b["min(sb)"].to_numpy(zero_copy_only=False).astype(np.float64)
        a_id = (pair >> np.uint64(32)).astype(np.int64)
        b_id = (pair & np.uint64(0xFFFFFFFF)).astype(np.int64)
        j = c / (sa + sb - c)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a_id, b_id]), pa.int64()),
                "partner": pa.array(np.concatenate([b_id, a_id]), pa.int64()),
                "jaccard": pa.array(
                    round_half_away(np.concatenate([j, j])), pa.float64()
                ),
            }
        )

    pairs = counted.map_batches(directed, batch_format="pyarrow")
    # group_topk ranks (order_col DESC, tie_col ASC): lowest partner wins ties
    best = group_topk(pairs, "doc_id", "jaccard", "partner", k=1).to_pandas()
    out = best[["doc_id", "partner", "jaccard"]].sort_values("doc_id")
    return out.reset_index(drop=True).astype({"doc_id": "int64", "partner": "int64"})

def sql_nearest_dup() -> str:
    return r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                          '[ \t\n\x0b\f\r]+'), t -> t <> '') AS ts
    FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(ts) = 0 THEN []
                WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                ELSE list_transform(range(1, len(ts) - 1),
                                    i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))
           END AS shingles
    FROM toks
), sets AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh),
pairs AS (
  SELECT a.doc_id, b.doc_id AS partner,
         len(list_intersect(a.s, b.s)) AS c, len(a.s) AS sa, len(b.s) AS sb
  FROM sets a JOIN sets b ON a.doc_id <> b.doc_id
  WHERE len(list_intersect(a.s, b.s)) > 0),
scored AS (
  SELECT doc_id, partner,
         round(c / CAST(sa + sb - c AS DOUBLE), 6) AS jaccard,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY round(c / CAST(sa + sb - c AS DOUBLE), 6) DESC, partner) AS rn
  FROM pairs)
SELECT doc_id, partner, jaccard FROM scored WHERE rn = 1
"""

def q_tokenset_dedup(sf_dir: str) -> pd.DataFrame:
    """Order- and multiplicity-insensitive exact dedup: canonical key =
    md5 of the sorted distinct token set, so reshuffled or
    repeated-sentence rewrites of the same vocabulary collapse into one
    group — the third exactness tier beside byte-exact (`dedup_exact`)
    and similarity (`dedup_ngram`). One hash-key groupby; keys are
    fixed-width digests, never the token sets themselves."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    from ..functions.textstats import _token_lists

    def canon(b: pa.Table) -> pa.Table:
        toks = _token_lists(b["text"].to_pandas())
        keys = [
            hashlib.md5(" ".join(sorted(set(ts))).encode()).hexdigest() for ts in toks
        ]
        return pa.table(
            {"key": pa.array(keys, pa.string()), "doc_id": b["doc_id"].cast(pa.int64())}
        )

    from ._common import bucket_group_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # doc-cardinality groups → partition-bucket (DESIGN.md round-4 rule)
    out = bucket_group_agg(
        ds.map_batches(canon, batch_format="pyarrow"),
        "key",
        {"n_docs": ("doc_id", "size"), "keep_doc": ("doc_id", "min")},
    ).to_pandas()
    out = out[out["n_docs"] > 1].sort_values("key").reset_index(drop=True)
    return out[["key", "n_docs", "keep_doc"]].astype(
        {"key": "object", "n_docs": "int64", "keep_doc": "int64"}
    )

def sql_tokenset_dedup() -> str:
    return r"""
WITH c AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                            '[ \t\n\x0b\f\r]+'), t -> t <> ''))), ' ')) AS key
  FROM documents)
SELECT key, count(*) AS n_docs, min(doc_id) AS keep_doc
FROM c GROUP BY key HAVING count(*) > 1
"""

def q_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Incremental-ingest dedup: which NEW docs (the synthetic
    increment: ids %5 == 0, re-crawled with the same token content)
    duplicate an EXISTING doc — the production shape where the new
    batch probes the corpus instead of re-pairing everything. One
    token-set-hash groupby; per group the new docs pair with the
    earliest old doc. New×new duplicates are NOT emitted (they dedup
    within the increment's own ingest)."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from ..functions.textstats import _token_lists

    def canon(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = _token_lists(b["text"].to_pandas())
        keys = [
            hashlib.md5(" ".join(sorted(set(ts))).encode()).hexdigest() for ts in toks
        ]
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "is_new": pa.array((ids % 5 == 0).astype(np.int64), pa.int64()),
            }
        )

    import pyarrow as pa

    _EMPTY = pa.table(
        {"new_doc": pa.array([], pa.int64()), "dup_of": pa.array([], pa.int64())}
    )

    def pair(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5)
        isn = g["is_new"].to_numpy(zero_copy_only=False)
        dids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        old, new = dids[isn == 0], dids[isn == 1]
        if not len(old) or not len(new):
            return _EMPTY
        return pa.table(
            {
                "new_doc": pa.array(np.sort(new), pa.int64()),
                "dup_of": pa.array(np.full(len(new), old.min(), np.int64)),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = (
        ds.map_batches(canon, batch_format="pyarrow")
        .groupby("key")
        .map_groups(pair, batch_format="pyarrow")
        .to_pandas()
    )
    return (
        out.sort_values("new_doc")
        .reset_index(drop=True)
        .astype({"new_doc": "int64", "dup_of": "int64"})
    )

def sql_incremental_dedup() -> str:
    return r"""
WITH c AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                            '[ \t\n\x0b\f\r]+'), t -> t <> ''))), ' ')) AS key,
         doc_id % 5 = 0 AS is_new
  FROM documents),
old AS (SELECT key, min(doc_id) AS keep FROM c WHERE NOT is_new GROUP BY key)
SELECT c.doc_id AS new_doc, o.keep AS dup_of
FROM c JOIN old o USING (key)
WHERE c.is_new
"""

def q_boilerplate_shingles(sf_dir: str) -> pd.DataFrame:
    """Boilerplate detection: the 20 most document-frequent 5-token
    shingles — repeated navigation/footer phrases surface as
    high-DF long shingles. Per-batch DISTINCT shingles per doc
    (combiner), one shingle-vocabulary groupby; the removal step would
    broadcast this table back as a filter."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.textstats import _token_lists

    K = 5

    def shingles(b: pa.Table) -> pa.Table:
        toks = _token_lists(b["text"].to_pandas())
        out: dict[str, int] = {}
        for ts in toks:
            if len(ts) < K:
                continue
            seen = {" ".join(ts[i : i + K]) for i in range(len(ts) - K + 1)}
            for s in seen:
                out[s] = out.get(s, 0) + 1
        if not out:
            return pa.table(
                {"shingle": pa.array([], pa.string()), "df_part": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "shingle": pa.array(list(out.keys()), pa.string()),
                "df_part": pa.array(np.fromiter(out.values(), np.int64), pa.int64()),
            }
        )

    from ._common import bucket_group_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    # shingle-cardinality groups → partition-bucket (DESIGN.md rule)
    agg = bucket_group_agg(
        ds.map_batches(shingles, batch_format="pyarrow"),
        "shingle",
        {"df": ("df_part", "sum")},
    ).to_pandas()
    out = agg.sort_values(["df", "shingle"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True).astype({"shingle": "object", "df": "int64"})

def sql_boilerplate_shingles() -> str:
    return r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                          '[ \t\n\x0b\f\r]+'), t -> t <> '') AS ts
    FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(ts) - 3),
                         i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3], ts[i+4]))) AS s
    FROM toks WHERE len(ts) >= 5
)
SELECT shingle, count(*) AS df
FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
GROUP BY shingle ORDER BY df DESC, shingle LIMIT 20
"""

def q_passage_dedup(sf_dir: str) -> pd.DataFrame:
    """Passage-granularity exact dedup audit (the RAG-corpus redundancy
    gate): docs → overlapping chunks (shared `_chunk_batch`), each
    chunk keyed by md5-lower-64 of its text, one hash groupby, then a
    scalar second aggregate over the hash-group table — n_chunks,
    distinct chunks, chunks sharing their text with another, and the
    largest duplicate class. Nothing chunk-cardinality-sized on the
    driver."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    def hash_chunks(b: pa.Table) -> pa.Table:
        t = _chunk_batch(b)
        hv = [
            int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
            for s in t["text"].to_pylist()
        ]
        # reinterpret as int64 so the groupby key stays native Arrow
        # (Ray's aggregate round-trips uint64 keys through Python ints,
        # which overflow C long and fall back to pickled objects)
        return pa.table(
            {"hv": pa.array(np.asarray(hv, np.uint64).view(np.int64), pa.int64())}
        )

    from ._common import bucket_group_agg

    groups = (
        bucket_group_agg(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
            .map_batches(hash_chunks, batch_format="pyarrow")
            .map_batches(
                lambda t: t.append_column(
                    "one", pa.array(np.ones(t.num_rows, np.int64), pa.int64())
                ),
                batch_format="pyarrow",
            ),
            "hv",
            {"c": ("one", "sum")},
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "c": t["c"].cast(pa.int64()),
                    "dup": pa.array(
                        np.where(
                            t["c"].to_numpy(zero_copy_only=False) > 1,
                            t["c"].to_numpy(zero_copy_only=False),
                            0,
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                    "one": pa.array(
                        np.ones(len(t), np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .aggregate(
            Sum("c", alias_name="n_chunks"),
            Sum("one", alias_name="n_distinct"),
            Sum("dup", alias_name="n_dup_chunks"),
            Max("c", alias_name="max_class"),
        )
    )
    n_chunks = int(groups["n_chunks"])
    n_dup = int(groups["n_dup_chunks"])
    return pd.DataFrame(
        {
            "n_chunks": [n_chunks],
            "n_distinct": [int(groups["n_distinct"])],
            "n_dup_chunks": [n_dup],
            "max_class": [int(groups["max_class"])],
            "dup_frac": [round_half_away(n_dup / n_chunks, 6)],
        }
    )

def sql_passage_dedup() -> str:
    w, st = CHUNK_W, CHUNK_STRIDE
    return rf"""
WITH tokl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                        '[ \t\n\x0b\f\r]+'), x -> x <> '') AS l
  FROM documents),
spans AS (
  SELECT doc_id, l, len(l) AS n,
         unnest(range(0, CAST(ceil(greatest(len(l) - {w}, 0) / {st}.0) AS BIGINT) + 1)) AS ck
  FROM tokl WHERE len(l) > 0),
hashes AS (
  SELECT md5_number_lower(array_to_string(l[ck * {st} + 1 : least(ck * {st} + {w}, n)], ' ')) AS hv
  FROM spans),
grp AS (SELECT hv, count(*) AS c FROM hashes GROUP BY hv)
SELECT CAST(sum(c) AS BIGINT) AS n_chunks,
       count(*) AS n_distinct,
       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       CAST(max(c) AS BIGINT) AS max_class,
       round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE), 6) AS dup_frac
FROM grp
"""

WINNOW_K = 4  # tokens per gram

WINNOW_W = 4  # grams per selection window

def q_winnowing_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken —
    the MOSS local-fingerprint scheme): per doc, hash every {K}-token
    gram (md5-lower-64 of the unit-separator-joined gram, the
    DuckDB-equal token hash), then per sliding window of {W} grams
    select the minimum hash, rightmost on ties — the guarantee-dense
    sample (expected density 2/(w+1)) shared-substring detectors key
    on. Fully vectorized: one sliding-window min per doc via stride
    tricks, no pair materialization. Output per source: docs with ≥1
    window, gram/window totals, distinct selected fingerprints and
    density."""
    import hashlib as _h

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.textstats import _token_lists

    def fp_batch(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pandas()
        toks = _token_lists(texts)
        srcs = b["source"].to_pylist()
        acc: dict[str, list[int]] = {}
        for src, ts in zip(srcs, toks):
            a = acc.setdefault(src, [0, 0, 0, 0])
            n = len(ts)
            if n < WINNOW_K:
                continue
            grams = [
                "\x1f".join(ts[i : i + WINNOW_K]) for i in range(n - WINNOW_K + 1)
            ]
            h = np.fromiter(
                (
                    int.from_bytes(_h.md5(g.encode()).digest()[8:], "little")
                    for g in grams
                ),
                np.uint64,
                count=len(grams),
            )
            ng = len(h)
            a[1] += ng
            if ng < WINNOW_W:
                continue
            win = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
            minv = win.min(axis=1)
            # rightmost index attaining the min in each window
            right = (
                WINNOW_W
                - 1
                - np.argmax(win[:, ::-1] == minv[:, None], axis=1)
            )
            sel_pos = np.arange(len(win)) + right
            a[0] += 1
            a[2] += len(win)
            a[3] += len(np.unique(sel_pos))
        if not acc:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "d1": pa.array([], pa.int64()),
                    "g1": pa.array([], pa.int64()),
                    "w1": pa.array([], pa.int64()),
                    "f1": pa.array([], pa.int64()),
                }
            )
        keys = sorted(acc)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "d1": pa.array([acc[k][0] for k in keys], pa.int64()),
                "g1": pa.array([acc[k][1] for k in keys], pa.int64()),
                "w1": pa.array([acc[k][2] for k in keys], pa.int64()),
                "f1": pa.array([acc[k][3] for k in keys], pa.int64()),
            }
        )

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(fp_batch, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("d1", alias_name="n_docs"),
            Sum("g1", alias_name="n_grams"),
            Sum("w1", alias_name="n_windows"),
            Sum("f1", alias_name="n_fp"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["density"] = round_half_away(
        out["n_fp"].to_numpy(np.float64) / out["n_windows"].to_numpy(np.float64), 6
    )
    return out.astype(
        {
            "source": "object",
            "n_docs": "int64",
            "n_grams": "int64",
            "n_windows": "int64",
            "n_fp": "int64",
        }
    )

def sql_winnowing_fingerprints() -> str:
    w = WINNOW_W
    return rf"""
WITH tok AS (
  SELECT doc_id, t,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS p
  FROM (SELECT doc_id, unnest(l) AS t, unnest(range(1, len(l) + 1)) AS pos
        FROM (SELECT doc_id,
                     string_split_regex(
                       lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                       '[ \t\n\x0b\f\r]+') AS l
              FROM documents))
  WHERE t <> ''),
grams AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) - 1 AS gp,
         md5_number_lower(t || chr(31) || lead(t, 1) OVER w2 || chr(31)
                          || lead(t, 2) OVER w2 || chr(31)
                          || lead(t, 3) OVER w2) AS h
  FROM tok
  WINDOW w2 AS (PARTITION BY doc_id ORDER BY p)
  QUALIFY lead(t, 3) OVER w2 IS NOT NULL),
pk AS (
  SELECT doc_id, gp,
         CAST(h AS HUGEINT) * 1048576 + (1048575 - gp) AS pack,
         count(*) OVER (PARTITION BY doc_id) AS ng
  FROM grams),
wmin AS (
  SELECT doc_id, ng,
         min(pack) OVER (PARTITION BY doc_id ORDER BY gp
                         ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS sel
  FROM pk QUALIFY gp <= ng - {w}),
perdoc AS (
  SELECT doc_id, any_value(ng) AS ng, count(DISTINCT sel) AS nsel,
         any_value(ng) - {w - 1} AS nwin
  FROM wmin GROUP BY doc_id),
tot AS (
  SELECT d.source, count(*) AS n_docs, sum(g.ng) AS n_grams,
         sum(g.nwin) AS n_windows, sum(g.nsel) AS n_fp
  FROM perdoc g JOIN documents d USING (doc_id)
  GROUP BY d.source),
short AS (
  -- docs whose gram count is in [1, {w}) contribute grams but no windows
  SELECT d.source, sum(p.ng) AS g_extra
  FROM (SELECT doc_id, count(*) AS ng FROM grams GROUP BY doc_id
        HAVING count(*) < {w}) p
  JOIN documents d USING (doc_id)
  GROUP BY d.source)
SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(t.n_grams + coalesce(s.g_extra, 0) AS BIGINT) AS n_grams,
       CAST(t.n_windows AS BIGINT) AS n_windows, CAST(t.n_fp AS BIGINT) AS n_fp,
       round(CAST(t.n_fp AS DOUBLE) / t.n_windows, 6) AS density
FROM tot t LEFT JOIN short s ON s.source = t.source
ORDER BY t.source
"""
