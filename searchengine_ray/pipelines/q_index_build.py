"""Index-build / maintenance pipelines: postings stats, compaction, audits, exports.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS
from ._common import CACHE_ROOT, DELETE_KW, EVAL_QUERIES, SEARCH_KW, _engine, documents_index, round_half_away, sql_delete_search, sql_tokens_cte  # noqa: F401


def sql_term_stats() -> str:
    return f"""
WITH {sql_tokens_cte()}
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf FROM toks GROUP BY term
"""

def q_doc_lengths(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    idx = documents_index(sf_dir, "punct")
    t = pq.read_table(str(idx / "analyzed"), columns=["doc_id", "dl"])
    df = t.to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["dl"] = df["dl"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)

def sql_doc_lengths() -> str:
    # docs that analyze to zero tokens keep dl=0 via left join
    return f"""
WITH {sql_tokens_cte()}
SELECT d.doc_id, CAST(coalesce(sum(toks.tf), 0) AS BIGINT) AS dl
FROM documents d LEFT JOIN toks ON d.doc_id = toks.doc_id
GROUP BY d.doc_id
"""

def q_increment_compact(sf_dir: str) -> pd.DataFrame:
    """D1/D2: incremental generation + compaction — build over the first
    half of ``documents``, attach the second half as a generation,
    delete-by-keyword, compact, then keyword-search. SQL-oracle-able
    because the end state equals a plain filtered search."""
    import shutil

    import duckdb

    from ..build import build_index
    from ..build.merge import build_increment, compact
    from ..query import SearchEngine

    work = CACHE_ROOT / f"inc-{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    half = n // 2
    for name, cond in (("a", f"doc_id < {half}"), ("b", f"doc_id >= {half}")):
        con.execute(
            f"COPY (SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
            f"WHERE {cond}) TO '{work}/{name}.parquet' (FORMAT PARQUET)"
        )
    idx = work / "idx"
    build_index(str(work / "a.parquet"), idx, analyzer_mode="punct",
                doc_id_column="doc_id", url_column=None, num_shards=8)
    build_increment(str(work / "b.parquet"), idx, work / "delta",
                    doc_id_column="doc_id", url_column=None)
    eng = SearchEngine(idx)
    eng.delete_by_keyword(DELETE_KW)
    compact(idx)
    ids = SearchEngine(idx).search_keyword(SEARCH_KW)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})

def sql_increment_compact() -> str:
    # end state == delete_search semantics over the full corpus
    return sql_delete_search()

def q_tfidf_export(sf_dir: str) -> pd.DataFrame:
    """Sparse doc-term TF-IDF matrix export from index artifacts (the
    feature-extraction bridge to downstream ML): every (doc, term,
    weight) for a deterministic 1-in-4 doc sample. The sample filter
    runs on the Dataset (bit-mask kernel), not the driver; at full
    scale this is a write_parquet sink instead of to_pandas."""
    from ..functions.keywords import doc_keywords

    def sample(b):
        import pyarrow.compute as pc

        return b.filter(pc.equal(pc.bit_wise_and(b["doc_id"], 3), 0))

    idx = documents_index(sf_dir, "punct")
    out = (
        doc_keywords(idx, k=1_000_000)
        .map_batches(sample, batch_format="pyarrow")
        .to_pandas()
    )
    return out[["doc_id", "term", "score"]].astype({"doc_id": "int64"})

def sql_tfidf_export() -> str:
    return f"""
WITH {sql_tokens_cte()},
df AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS n FROM documents)
SELECT t.doc_id, t.term,
       round(t.tf * log10(CAST(n.n AS DOUBLE) / d.df + 1.0), 6) AS score
FROM toks t JOIN df d USING (term) CROSS JOIN n
WHERE t.doc_id % 4 = 0
"""

def q_partitioned_write(sf_dir: str) -> pd.DataFrame:
    """Hive-partitioned sink (the resumable-output contract): write
    documents partitioned by lang (one directory per key — a failed run
    skips finished partitions), then read ONE partition back via
    directory pruning and aggregate. Returns per-lang doc counts + char
    sums computed from the re-read, proving write/read fidelity."""
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    base = CACHE_ROOT / f"partwrite-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    if base.exists():
        shutil.rmtree(base)
    base.mkdir(parents=True)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    docs.write_parquet(str(base), partition_cols=["lang"])

    out = (
        rd.read_parquet(str(base))
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="chars"))
        .to_pandas()
    )
    out["lang"] = out["lang"].astype("object")
    return out.astype({"n_docs": "int64", "chars": "int64"})

def sql_partitioned_write() -> str:
    return """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY lang
"""

def q_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """Recrawl diff: classify every url/doc as added / removed / changed
    between two crawl snapshots (snapshot B is a deterministic recrawl
    of documents: ids %13 dropped, %7 re-extracted with new content,
    %11 spawn a fresh page). Each batch emits compact per-side rows
    (doc_id, side indicators, content fingerprint) — payload text never
    transits the shuffle — and ONE groupby(doc_id) classifies; at
    100 TB this is the incremental-crawl planning job."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    def fp64(texts) -> np.ndarray:
        # 63-bit positive fingerprint: stays > the 0 "absent" sentinel,
        # so Max() over {fp, 0} recovers the side's fingerprint exactly
        out = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            out[i] = int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little") >> 1
        return out

    def sides(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = b["text"].to_pandas().to_numpy(object)
        fa = fp64(txt)
        # snapshot B rows derived from the same batch
        keep = ids % 13 != 0
        b_ids, b_fp = ids[keep], fa[keep].copy()
        chg = b_ids % 7 == 0
        if chg.any():
            b_fp[chg] = fp64([t + " updated v2" for t in txt[keep][chg]])
        new_src = ids[ids % 11 == 0]
        add_ids = new_src + 10_000_000
        add_fp = fp64([f"fresh page {i}" for i in new_src])
        out_ids = np.concatenate([ids, b_ids, add_ids])
        in_a = np.concatenate([np.ones_like(ids), np.zeros_like(b_ids), np.zeros_like(add_ids)])
        in_b = 1 - in_a
        fp_a = np.concatenate([fa, np.zeros_like(b_fp), np.zeros_like(add_fp)])
        fp_b = np.concatenate([np.zeros_like(fa), b_fp, add_fp])
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "in_a": pa.array(in_a, pa.int64()),
                "in_b": pa.array(in_b, pa.int64()),
                "fp_a": pa.array(fp_a, pa.int64()),
                "fp_b": pa.array(fp_b, pa.int64()),
            }
        )

    def classify(b: pa.Table) -> pa.Table:
        a = b["sum(in_a)"].to_numpy(zero_copy_only=False)
        bb = b["sum(in_b)"].to_numpy(zero_copy_only=False)
        fa = b["max(fp_a)"].to_numpy(zero_copy_only=False)
        fb = b["max(fp_b)"].to_numpy(zero_copy_only=False)
        status = np.where(
            a == 0, "added", np.where(bb == 0, "removed", np.where(fa != fb, "changed", ""))
        )
        t = pa.table(
            {"doc_id": b["doc_id"], "status": pa.array(status, pa.string())}
        )
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t["status"], ""))

    from ._common import bucket_group_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # doc-cardinality groups → partition-bucket (DESIGN.md round-4 rule)
    out = (
        bucket_group_agg(
            ds.map_batches(sides, batch_format="pyarrow"),
            "doc_id",
            {
                "sum(in_a)": ("in_a", "sum"),
                "sum(in_b)": ("in_b", "sum"),
                "max(fp_a)": ("fp_a", "max"),
                "max(fp_b)": ("fp_b", "max"),
            },
        )
        .map_batches(classify, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64"})

def sql_snapshot_diff() -> str:
    return """
WITH snap_b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' updated v2' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, 'fresh page ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 11 = 0),
j AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.text <> b.text THEN 'changed' END AS status
  FROM documents a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id)
SELECT doc_id, status FROM j WHERE status IS NOT NULL
"""

TERM_DRIFT_K = 10

def q_term_drift(sf_dir: str) -> pd.DataFrame:
    """Corpus drift detection: Laplace-smoothed log-frequency-ratio of
    every term between two corpus halves (doc_id parity as the time
    axis), top-10 rising and falling movers. One vocabulary-sized
    shuffle carrying two partial counts per term — the monitoring job
    that flags vocabulary shift between crawl snapshots before a model
    trains on them."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.textstats import _token_lists

    def halves(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = _token_lists(b["text"].to_pandas())
        lens = toks.map(len).to_numpy(np.int64)
        half = np.repeat(ids % 2, lens)
        df = pd.DataFrame({"term": [t for ts in toks for t in ts], "h": half})
        g = df.groupby(["term", "h"], as_index=False).size()
        return pa.table(
            {
                "term": pa.array(g["term"].to_numpy(object), pa.string()),
                "n0": pa.array(np.where(g["h"] == 0, g["size"], 0).astype(np.int64)),
                "n1": pa.array(np.where(g["h"] == 1, g["size"], 0).astype(np.int64)),
            }
        )

    from ._common import bucket_group_agg

    # vocab-cardinality groups → partition-bucket (DESIGN.md round-4 rule)
    agg = bucket_group_agg(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(halves, batch_format="pyarrow"),
        "term",
        {"n0": ("n0", "sum"), "n1": ("n1", "sum")},
    ).to_pandas()
    v = float(len(agg))
    tot0, tot1 = float(agg["n0"].sum()), float(agg["n1"].sum())
    agg["lr"] = np.round(
        np.log((agg["n1"] + 1.0) / (tot1 + v)) - np.log((agg["n0"] + 1.0) / (tot0 + v)),
        6,
    )
    rising = agg.sort_values(["lr", "term"], ascending=[False, True]).head(TERM_DRIFT_K)
    falling = agg.sort_values(["lr", "term"], ascending=[True, True]).head(TERM_DRIFT_K)
    out = pd.concat(
        [rising.assign(direction="rising"), falling.assign(direction="falling")],
        ignore_index=True,
    )
    return out[["direction", "term", "n0", "n1", "lr"]].astype(
        {"direction": "object", "term": "object", "n0": "int64", "n1": "int64"}
    )

def sql_term_drift() -> str:
    return rf"""
WITH tok AS (
  SELECT doc_id % 2 AS h, t AS term
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                         '[ \t\n\x0b\f\r]+')) AS t
        FROM documents)
  WHERE t <> ''),
agg AS (
  SELECT term,
         CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM tok GROUP BY term),
c AS (SELECT count(*) AS v, sum(n0) AS tot0, sum(n1) AS tot1 FROM agg),
lr AS (
  SELECT term, n0, n1,
         round(ln((n1 + 1.0) / (tot1 + v)) - ln((n0 + 1.0) / (tot0 + v)), 6) AS lr
  FROM agg CROSS JOIN c),
rising AS (SELECT 'rising' AS direction, term, n0, n1, lr
           FROM lr ORDER BY lr DESC, term LIMIT {TERM_DRIFT_K}),
falling AS (SELECT 'falling' AS direction, term, n0, n1, lr
            FROM lr ORDER BY lr ASC, term LIMIT {TERM_DRIFT_K})
SELECT * FROM rising UNION ALL SELECT * FROM falling
"""

def q_posting_gaps(sf_dir: str) -> pd.DataFrame:
    """Index-compression analytics: per-term doc-id delta statistics
    (df, mean gap, max gap) for the 20 highest-df terms — the numbers
    that size a delta+varbyte posting layout (mean gap ⇒ bytes/posting).
    Computed from the analyzed artifacts with a per-term vectorized
    diff; one vocabulary-sized shuffle."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.textstats import _token_lists

    def pairs(b: pa.Table) -> pa.Table:
        toks = _token_lists(b["text"].to_pandas())
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sets = [sorted(set(ts)) for ts in toks]
        lens = np.array([len(s) for s in sets], np.int64)
        return pa.table(
            {
                "term": pa.array([t for s in sets for t in s], pa.string()),
                "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
            }
        )

    # vocab-cardinality groups → partition-bucket (DESIGN.md round-4
    # rule): hash terms to partitions; inside each, ONE vectorized
    # sorted-run pass computes df / sum-gap / max-gap for every term
    def add_tpart(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(b["term"].to_numpy(zero_copy_only=False))
        return b.append_column(
            "_gp", pa.array((h % np.uint64(32)).astype(np.int32), pa.int32())
        )

    def gap_stats(g) -> pa.Table:
        g = g.combine_chunks()
        term = g["term"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        tcodes, tuniq = pd.factorize(term)
        order = np.lexsort((doc, tcodes))
        tc, dc = tcodes[order], doc[order]
        gap = np.empty(len(tc), np.float64)
        gap[0] = np.nan
        gap[1:] = np.where(tc[1:] != tc[:-1], np.nan, (dc[1:] - dc[:-1]).astype(np.float64))
        df = pd.DataFrame({"t": tc, "gap": gap})
        grp = df.groupby("t", sort=False)["gap"]
        agg = pd.DataFrame(
            {"df": grp.size(), "sum_gap": grp.sum(), "max_gap": grp.max()}
        ).reset_index()
        return pa.table(
            {
                "term": pa.array(tuniq[agg["t"].to_numpy(np.int64)], pa.string()),
                "df": pa.array(agg["df"].to_numpy(np.int64), pa.int64()),
                "sum_gap": pa.array(agg["sum_gap"].fillna(0).to_numpy(np.int64), pa.int64()),
                "max_gap": pa.array(agg["max_gap"].fillna(0).to_numpy(np.int64), pa.int64()),
            }
        )

    rows = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .map_batches(add_tpart, batch_format="pyarrow")
        .groupby("_gp")
        .map_groups(gap_stats, batch_format="pyarrow")
        .to_pandas()
    )
    rows["mean_gap"] = round_half_away(
        rows["sum_gap"] / np.maximum(rows["df"] - 1, 1)
    )
    out = rows.sort_values(["df", "term"], ascending=[False, True]).head(20)
    return out[["term", "df", "mean_gap", "max_gap"]].reset_index(drop=True).astype(
        {"term": "object", "df": "int64", "max_gap": "int64"}
    )

def sql_posting_gaps() -> str:
    return r"""
WITH tok AS (
  SELECT DISTINCT doc_id, t AS term
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                         '[ \t\n\x0b\f\r]+')) AS t
        FROM documents)
  WHERE t <> ''),
g AS (
  SELECT term, doc_id,
         doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id) AS gap
  FROM tok),
agg AS (
  SELECT term, count(*) AS df,
         coalesce(CAST(sum(gap) AS BIGINT), 0) AS sum_gap,
         coalesce(CAST(max(gap) AS BIGINT), 0) AS max_gap
  FROM g GROUP BY term)
SELECT term, df,
       round(sum_gap / CAST(greatest(df - 1, 1) AS DOUBLE), 6) AS mean_gap,
       max_gap
FROM agg ORDER BY df DESC, term LIMIT 20
"""

def q_index_audit(sf_dir: str) -> pd.DataFrame:
    """Global index integrity audit: vocabulary size and posting count
    recomputed from the REAL on-disk index artifacts (one pruned
    (term, n) scan over the posting shards — block rows Sum per term,
    then counted), plus n_docs / total_tokens from the manifest. The
    oracle recomputes all four from the raw corpus, so a lost block, a
    double-written posting or a drifted manifest stat all fail the
    hash. (Salting changes shard placement only, never the term
    column, so Σn per term is salt-invariant.)"""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    idx = documents_index(sf_dir)
    eng = _engine(sf_dir)
    from ._common import bucket_group_agg

    # vocab-cardinality groups → partition-bucket (DESIGN.md round-4 rule)
    per_term = bucket_group_agg(
        rd.read_parquet(f"{idx}/postings", columns=["term", "n"]),
        "term",
        {"postings": ("n", "sum")},
    )
    agg = per_term.aggregate(Count(alias_name="n_terms"), Sum("postings", alias_name="n_postings"))
    return pd.DataFrame(
        {
            "n_docs": [int(eng.manifest.n_docs)],
            "n_terms": [int(agg["n_terms"])],
            "n_postings": [int(agg["n_postings"])],
            "total_tokens": [int(eng.manifest.total_tokens)],
        }
    ).astype("int64")

def sql_index_audit() -> str:
    return f"""
WITH {sql_tokens_cte()}
SELECT (SELECT count(*) FROM documents) AS n_docs,
       count(DISTINCT term) AS n_terms,
       count(*) AS n_postings,
       CAST(sum(tf) AS BIGINT) AS total_tokens
FROM toks
"""

CHAMPION_M = 8

def q_champion_lists(sf_dir: str) -> pd.DataFrame:
    """Tiered-index champion lists (IIR §7.1.3, the static pruning tier
    the reference's full TF-IDF scan lacks): per term keep only the
    top-m docs by (tf desc, doc_id) and audit how much of the true
    top-10 the pruned candidate union recovers per eval query. The
    champion sets come from a distributed per-term top-m groupby
    (restricted to the probed vocabulary — each term's list is
    independent of all others, so pruning the build to the query terms
    is semantics-preserving); the ranking side is the engine's full
    TF-IDF (6dp-rounded, doc_id ties), the query path not a rescan."""
    import pyarrow as pa
    import ray.data as rd

    from ..functions.textstats import _token_lists

    qterms = sorted({t for q in EVAL_QUERIES for t in q})
    qset = set(qterms)

    def pairs(b: pa.Table) -> pa.Table:
        toks = _token_lists(b["text"].to_pandas())
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = toks.map(len).to_numpy(np.int64)
        flat = pd.Series([t for ts in toks for t in ts], dtype="object")
        docrep = np.repeat(ids, lens)
        m = flat.isin(qset).to_numpy()
        df = pd.DataFrame({"term": flat.to_numpy()[m], "doc_id": docrep[m]})
        g = (
            df.groupby(["term", "doc_id"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        return pa.table(
            {
                "term": pa.array(g["term"], pa.string()),
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
                "tf": pa.array(g["tf"].to_numpy(np.int64), pa.int64()),
            }
        )

    def topm(g: pa.Table) -> pa.Table:
        g = g.sort_by([("tf", "descending"), ("doc_id", "ascending")]).slice(
            0, CHAMPION_M
        )
        return g.select(["term", "doc_id"])

    champ_rows = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("term")
        .map_groups(topm, batch_format="pyarrow")
        .to_pandas()
    )
    champ: dict[str, set[int]] = {
        t: set(g["doc_id"].astype(int)) for t, g in champ_rows.groupby("term")
    }

    eng = _engine(sf_dir)
    rows = []
    for qid, terms in enumerate(EVAL_QUERIES):
        res = eng.search_tfidf(terms, None)
        docs = np.asarray([d for d, _ in res], np.int64)
        scores = np.asarray([round(s, 6) for _, s in res], np.float64)
        order = np.lexsort((docs, -scores))
        full_top = [int(d) for d in docs[order][:10]]
        cand = set().union(*(champ.get(t, set()) for t in terms))
        champ_top = [int(d) for d in docs[order] if int(d) in cand][:10]
        hits = len(set(full_top) & set(champ_top))
        rows.append(
            {
                "qid": qid,
                "n_cands": len(cand),
                "hits10": hits,
                "recall10": float(round_half_away(hits / len(full_top), 6)),
            }
        )
    return pd.DataFrame(rows).astype(
        {"qid": "int64", "n_cands": "int64", "hits10": "int64"}
    )

def sql_champion_lists() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in enumerate(EVAL_QUERIES) for t in terms
    )
    return f"""
WITH {sql_tokens_cte()},
q(qid, term) AS (VALUES {vals}),
qt AS (SELECT DISTINCT term FROM q),
champ AS (
  SELECT term, doc_id FROM (
    SELECT toks.term, toks.doc_id,
           row_number() OVER (PARTITION BY toks.term
                              ORDER BY toks.tf DESC, toks.doc_id) AS rn
    FROM toks JOIN qt USING (term)) WHERE rn <= {CHAMPION_M}),
cand AS (SELECT DISTINCT q.qid, champ.doc_id FROM q JOIN champ USING (term)),
stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
idf AS (
  SELECT q.qid, q.term, log10(CAST(n.c AS DOUBLE) / stats.df + 1) AS idf
  FROM q JOIN stats USING (term) CROSS JOIN n),
scored AS (
  SELECT idf.qid, toks.doc_id,
         sum((toks.tf * idf.idf) * (1 * idf.idf)) AS dot,
         sum((toks.tf * idf.idf) * (toks.tf * idf.idf)) AS len
  FROM toks JOIN idf USING (term) GROUP BY idf.qid, toks.doc_id),
s AS (SELECT qid, doc_id, round(dot / sqrt(len), 6) AS score
      FROM scored WHERE len > 0),
fullr AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
  FROM s),
ftop AS (SELECT qid, doc_id FROM fullr WHERE rnk <= 10),
champr AS (
  SELECT s.qid, s.doc_id,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.score DESC, s.doc_id) AS rnk
  FROM s JOIN cand ON cand.qid = s.qid AND cand.doc_id = s.doc_id),
ctop AS (SELECT qid, doc_id FROM champr WHERE rnk <= 10),
nc AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_cands FROM cand GROUP BY qid),
nf AS (SELECT qid, count(*) AS nfull FROM ftop GROUP BY qid),
hit AS (
  SELECT f.qid, CAST(count(*) AS BIGINT) AS hits10
  FROM ftop f JOIN ctop c ON f.qid = c.qid AND f.doc_id = c.doc_id
  GROUP BY f.qid)
SELECT nc.qid, nc.n_cands,
       coalesce(hit.hits10, 0) AS hits10,
       round(coalesce(hit.hits10, 0) / CAST(nf.nfull AS DOUBLE), 6) AS recall10
FROM nc JOIN nf USING (qid) LEFT JOIN hit USING (qid)
ORDER BY nc.qid
"""
