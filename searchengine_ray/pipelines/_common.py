"""Shared helpers for the pipeline registry (index cache, SQL token CTE, rounding).

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS


CACHE_ROOT = Path("/tmp/searchengine_ray_cache")

def round_half_away(x, nd: int = 6):
    """DuckDB-compatible round (half away from zero). np.round is
    half-even, which disagrees with SQL ``round()`` whenever a value
    lands EXACTLY on the decimal grid half — ratios of small integers
    do (e.g. 195/384 = 0.5078125 at 6dp). Use this for any rounded
    integer-ratio column that an oracle recomputes."""
    x = np.asarray(x, np.float64)
    p = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p

SQL_TOKENS_CTE = r"""
toks AS (
    SELECT doc_id, t AS term, count(*) AS tf
    FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                         '[ \t\n\x0b\f\r]+')) AS t
        FROM documents
    )
    WHERE t <> '' AND t NOT IN ({stoplist})
    GROUP BY doc_id, t
)
"""

def _stoplist_sql() -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(STOP_WORDS))

def sql_tokens_cte() -> str:
    return SQL_TOKENS_CTE.format(stoplist=_stoplist_sql())

def _index_dir(sf_dir: str, mode: str) -> Path:
    key = hashlib.md5(f"{sf_dir}|{mode}|v1".encode()).hexdigest()[:16]
    return CACHE_ROOT / f"idx-{key}-{mode}"

def documents_index(sf_dir: str, mode: str = "punct") -> Path:
    """Build (or reuse) an index over ``documents.parquet`` in ``mode``."""
    from ..build import build_index

    idx = _index_dir(sf_dir, mode)
    marker = idx / "manifest.json"
    if not marker.exists():
        build_index(
            f"{sf_dir}/documents.parquet",
            idx,
            analyzer_mode=mode,
            doc_id_column="doc_id",
            url_column=None,
            num_shards=8,
            block_size=128,
        )
    return idx

def _engine(sf_dir: str, mode: str = "punct"):
    from ..query import SearchEngine

    return SearchEngine(documents_index(sf_dir, mode))

def q_term_stats(sf_dir: str) -> pd.DataFrame:
    """A1/A2/A3: the postings groupby — df and total tf per term.

    Combiner pattern (same as the build shuffle): partial per-(term,
    batch) df/tf rows inside ``map_batches``, then a small Sum groupby —
    the shuffle moves one row per (term, batch) instead of one per
    posting."""
    import ray.data as rd

    from ..stages.postings import explode_partials

    idx = documents_index(sf_dir, "punct")
    analyzed = rd.read_parquet(str(idx / "analyzed"))

    def partial_stats(b):
        import pyarrow as pa
        import pyarrow.compute as pc

        part = explode_partials(b, 1, False)
        ids = part["doc_ids"].combine_chunks()
        tfs = part["tfs"].combine_chunks()
        df_part = pc.list_value_length(ids).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = tfs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        tf_part = (
            np.add.reduceat(flat, offs[:-1])
            if len(flat)
            else np.zeros(len(df_part), np.int64)
        )
        tf_part[df_part == 0] = 0
        return pa.table(
            {
                "term": part["term"],
                "df_part": pa.array(df_part, pa.int64()),
                "tf_part": pa.array(tf_part, pa.int64()),
            }
        )

    # vocab-cardinality groups: partition-bucket + pandas C-hash inner
    # groupby, not a native aggregate (per-GROUP Python ~5 µs — see
    # functions/dedup.py pair counting)
    def add_tpart(b):
        import pyarrow as pa

        h = pd.util.hash_array(b["term"].to_numpy(zero_copy_only=False))
        return b.append_column(
            "_tp", pa.array((h % np.uint64(32)).astype(np.int32), pa.int32())
        )

    def sum_terms(g):
        import pyarrow as pa

        df = g.to_pandas()
        out = df.groupby("term", sort=False, as_index=False).agg(
            df=("df_part", "sum"), total_tf=("tf_part", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    out = (
        analyzed.map_batches(partial_stats, batch_format="pyarrow")
        .map_batches(add_tpart, batch_format="pyarrow")
        .groupby("_tp")
        .map_groups(sum_terms, batch_format="pyarrow")
        .to_pandas()
    )
    return out[["term", "df", "total_tf"]].astype({"df": "int64", "total_tf": "int64"})

def bucket_group_agg(ds, key: str | list[str], aggs: dict, n_parts: int = 32):
    """Partition-bucket grouped aggregation for ROW-SCALING group counts
    (DESIGN.md round-4 rule): hash ``key`` (one column or a list) into
    ``n_parts`` partitions, run a pandas C-hash groupby inside each —
    identical results to a native ``groupby(key).aggregate(...)``
    without its ~5 µs-per-group Python cost. ``aggs``:
    ``{out_col: (src_col, how)}`` with how in pandas agg vocabulary
    ('sum', 'min', 'max', 'size'). Returns a Dataset with columns
    ``[*keys, *aggs]``."""
    keys = [key] if isinstance(key, str) else list(key)

    def add_part(b):
        import pyarrow as pa

        h = pd.util.hash_array(b[keys[0]].to_numpy(zero_copy_only=False))
        for k in keys[1:]:
            h = h * np.uint64(31) + pd.util.hash_array(
                b[k].to_numpy(zero_copy_only=False)
            )
        return b.append_column(
            "_gp", pa.array((h % np.uint64(n_parts)).astype(np.int32), pa.int32())
        )

    def combine(g):
        import pyarrow as pa

        df = g.to_pandas()
        gb = df.groupby(keys, sort=False)
        parts = []
        for o, (s, how) in aggs.items():
            ser = gb[s].size() if how == "size" else gb[s].agg(how)
            ser.name = o
            parts.append(ser)
        out = pd.concat(parts, axis=1).reset_index()
        return pa.Table.from_pandas(out[[*keys, *aggs]], preserve_index=False)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_gp")
        .map_groups(combine, batch_format="pyarrow")
    )


DELETE_KW, SEARCH_KW = "slow", "fast"

BM25_QUERY = "window merge query"

def sql_delete_search() -> str:
    return f"""
WITH {sql_tokens_cte()}
SELECT DISTINCT doc_id FROM toks WHERE term = '{SEARCH_KW}'
AND doc_id NOT IN (SELECT doc_id FROM toks WHERE term = '{DELETE_KW}')
"""

def sql_bm25_all() -> str:
    qterms = ", ".join(f"('{t}')" for t in BM25_QUERY.split())
    return f"""
WITH {sql_tokens_cte()},
q(term) AS (VALUES {qterms}),
qtf AS (SELECT term, count(*) AS qn FROM q GROUP BY term),
dls AS (SELECT doc_id, sum(tf) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
avgdl AS (SELECT sum(dl) / CAST((SELECT c FROM n) AS DOUBLE) AS v FROM dls),
scored AS (
    SELECT toks.doc_id,
           sum(((1.2 + 1.0) * ln((CAST(n.c AS DOUBLE) - stats.df + 0.5) / (stats.df + 0.5) + 1.0))
               * (toks.tf / (toks.tf + 1.2 * (1.0 - 0.75 + 0.75 * dls.dl / avgdl.v)))
               * qtf.qn) AS score
    FROM toks
    JOIN qtf USING (term) JOIN stats USING (term) JOIN dls USING (doc_id)
    CROSS JOIN n CROSS JOIN avgdl
    GROUP BY toks.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scored
"""

def pa_eq(t, col, val):
    import pyarrow.compute as pc

    return pc.equal(t[col], val)

_RAW_TOKENS_CTE = r"""
raw AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                     '[ \t\n\x0b\f\r]+')) AS t
    FROM documents
),
per_doc AS (
    SELECT d.doc_id,
           CAST(coalesce(count(r.t), 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(sum(CASE WHEN r.t IN ({stoplist_en}) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_stop,
           CAST(coalesce(sum(length(r.t)), 0) AS BIGINT) AS tok_chars
    FROM documents d LEFT JOIN (SELECT * FROM raw WHERE t <> '') r USING (doc_id)
    GROUP BY d.doc_id
)
"""

def _raw_tokens_cte() -> str:
    return _RAW_TOKENS_CTE.format(
        stoplist_en=", ".join("'" + w + "'" for w in sorted(EN_STOP_WORDS))
    )

CHUNK_W, CHUNK_STRIDE = 32, 24

def _chunk_batch(batch):
    """Vectorized-per-doc passage chunker shared by `passage_chunks`
    and `passage_dedup` (windows of CHUNK_W tokens at CHUNK_STRIDE,
    last partial window kept iff it adds new tokens)."""
    import pyarrow as pa

    from searchengine_ray.functions.textstats import _token_lists

    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = _token_lists(batch["text"].to_pandas())
    o_id, o_ck, o_n, o_tx = [], [], [], []
    for i, tl in zip(ids, toks):
        n = len(tl)
        if n == 0:
            continue
        starts = range(0, max(n - CHUNK_W, 0) + 1, CHUNK_STRIDE)
        # plus a tail chunk when the stride grid stops short
        last = list(starts)[-1] if starts else 0
        tail = [] if last + CHUNK_W >= n else [last + CHUNK_STRIDE]
        for ck, s in enumerate(list(starts) + tail):
            win = tl[s : s + CHUNK_W]
            o_id.append(int(i))
            o_ck.append(ck)
            o_n.append(len(win))
            o_tx.append(" ".join(win))
    return pa.table(
        {
            "doc_id": pa.array(o_id, pa.int64()),
            "chunk_id": pa.array(o_ck, pa.int64()),
            "n_tokens": pa.array(o_n, pa.int64()),
            "text": pa.array(o_tx, pa.string()),
        }
    )

QE_SEED = "fast scan"

def _sql_bm25_scored(qcte: str) -> str:
    """BM25 scored-docs CTE body over query-term CTE ``qcte`` (qn=1 per
    term) — shares dls/stats/n/avgdl CTE names with the caller."""
    return f"""
    SELECT toks.doc_id,
           sum(((1.2 + 1.0) * ln((CAST(n.c AS DOUBLE) - stats.df + 0.5) / (stats.df + 0.5) + 1.0))
               * (toks.tf / (toks.tf + 1.2 * (1.0 - 0.75 + 0.75 * dls.dl / avgdl.v)))) AS score
    FROM toks
    JOIN {qcte} USING (term) JOIN stats USING (term) JOIN dls USING (doc_id)
    CROSS JOIN n CROSS JOIN avgdl
    GROUP BY toks.doc_id
"""

EVAL_QUERIES = [["join", "window"], ["merge", "query", "sort"], ["hash", "scan"]]
