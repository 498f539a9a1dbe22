"""Training-data prep: BPE, chunking, packing, mixtures, splits, sampling.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS
from ._common import CHUNK_STRIDE, CHUNK_W, QE_SEED, _chunk_batch, _engine, _sql_bm25_scored, _stoplist_sql, round_half_away, sql_tokens_cte  # noqa: F401


def q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sampling: keep 10% of 'en' docs, 30% of
    every other language, by multiplicative hash of doc_id — streaming,
    no shuffle, bit-reproducible across engines."""
    import ray.data as rd

    from searchengine_ray.functions.sampling import stratified_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    out = stratified_sample(
        ds, key_col="doc_id", strata_col="lang", rates={"en": 10}, default_pct=30
    ).to_pandas()
    return out.astype({"doc_id": "int64", "n_chars": "int64"})

def sql_stratified_sample() -> str:
    return """
SELECT doc_id, lang, n_chars FROM documents
WHERE ((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296) % 100
      < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
"""

def q_group_sample(sf_dir: str) -> pd.DataFrame:
    """Exact-N-per-group deterministic sample: at most 5 docs per lang,
    chosen by multiplicative-hash order of doc_id (reproducible across
    engines and runs, unlike seeded sampling). Same combiner shape as
    group_topk: per-block partial top-5 per group → one small shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from searchengine_ray.functions.sampling import group_topk

    def hash_key(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(2**32)
        return b.append_column("hkey", pa.array(h.view(np.int64), pa.int64()))

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    out = group_topk(
        ds.map_batches(hash_key, batch_format="pyarrow"),
        group_col="lang", order_col="hkey", tie_col="doc_id", k=5,
    ).to_pandas()
    return out[["lang", "doc_id"]].astype({"doc_id": "int64"}).sort_values(
        ["lang", "doc_id"]
    ).reset_index(drop=True)

def sql_group_sample() -> str:
    return """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296 DESC, doc_id
         ) AS rk
  FROM documents
) WHERE rk <= 5
"""

def q_shuffle_train_order(sf_dir: str) -> pd.DataFrame:
    """Deterministic training-order shuffle: global sort by
    md5(doc_id) — a reproducible permutation any engine can replay
    (the resumable alternative to seeded random_shuffle); distributed
    range-partitioned sort, first 100 rows out. At 100 TB the md5 key
    would be a cheaper splitmix hash — md5 here because the permutation
    is part of the cross-engine contract."""
    import hashlib as _h

    import pyarrow as pa
    import ray.data as rd

    def key(b: pa.Table) -> pa.Table:
        ks = [
            _h.md5(str(d).encode()).hexdigest() for d in b["doc_id"].to_pylist()
        ]
        return pa.table({"doc_id": b["doc_id"], "k": pa.array(ks, pa.string())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = ds.map_batches(key, batch_format="pyarrow").sort("k").limit(100).to_pandas()
    out["pos"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["pos", "doc_id", "k"]].astype({"doc_id": "int64"})

def sql_shuffle_train_order() -> str:
    return """
SELECT CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) AS BIGINT) AS pos,
       doc_id, md5(CAST(doc_id AS VARCHAR)) AS k
FROM documents
ORDER BY k LIMIT 100
"""

def q_winsorize(sf_dir: str) -> pd.DataFrame:
    """Feature preprocessing: per-type p05/p95 (exact distributed
    quantiles, quantile_disc semantics) → broadcast the tiny clip table
    → clipped mean per type. Composes the quantile machinery with a
    second streaming aggregate — the outlier-robust normalization step
    of a feature pipeline."""
    import pyarrow as pa
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from searchengine_ray.functions.quantiles import grouped_quantiles

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    qs = grouped_quantiles(ev, "event_type", "value", [0.05, 0.95], quantize=3)
    lohi = {
        t: (
            float(g.loc[g["q"] == 0.05, "value"].iloc[0]),
            float(g.loc[g["q"] == 0.95, "value"].iloc[0]),
        )
        for t, g in qs.groupby("event_type")
    }
    ref = ray.put(lohi)

    def clip(b: pa.Table, _r=ref) -> pa.Table:
        m = ray.get(_r)
        t = b["event_type"].to_pandas()
        v = np.round(b["value"].to_numpy(zero_copy_only=False).astype(np.float64), 3)
        lo = t.map(lambda x: m[x][0]).to_numpy(np.float64)
        hi = t.map(lambda x: m[x][1]).to_numpy(np.float64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "v": pa.array(np.clip(v, lo, hi), pa.float64()),
            }
        )

    out = (
        ev.map_batches(clip, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("v", alias_name="s"))
        .to_pandas()
    )
    out["wins_mean"] = (out["s"] / out["n"]).round(6)
    out = out.drop(columns=["s"]).sort_values("event_type").reset_index(drop=True)
    return out.astype({"event_type": "object", "n": "int64"})

def sql_winsorize() -> str:
    return """
WITH b AS (
  SELECT event_type,
         quantile_disc(round(value, 3), 0.05) AS lo,
         quantile_disc(round(value, 3), 0.95) AS hi
  FROM events GROUP BY event_type)
SELECT e.event_type, count(*) AS n,
       round(avg(least(greatest(round(e.value, 3), b.lo), b.hi)), 6) AS wins_mean
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type
"""

def q_passage_chunks(sf_dir: str) -> pd.DataFrame:
    """RAG-style passage chunking: each doc → overlapping windows of
    CHUNK_W tokens at stride CHUNK_STRIDE (last partial window kept iff
    it starts before the end and adds new tokens). One vectorized
    streaming pass; output is the (doc_id, chunk_id, n_tokens, text)
    table a retrieval embedder consumes. Chunk count per doc is
    ⌈max(0, n−W)/stride⌉ + 1."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        ds.map_batches(_chunk_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )

def sql_passage_chunks() -> str:
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
  FROM tokl WHERE len(l) > 0)
SELECT doc_id, ck AS chunk_id,
       least(n - ck * {st}, {w}) AS n_tokens,
       array_to_string(l[ck * {st} + 1 : least(ck * {st} + {w}, n)], ' ') AS text
FROM spans
"""

def q_dataset_split(sf_dir: str) -> pd.DataFrame:
    """Reproducible train/val/test split (80/10/10 by id-hash) with
    per-split audit stats: the split key is a pure function of doc_id
    (md5 % 10), so a re-run, a retried shard or a different engine
    assigns every doc to the same split; the checksum is a
    Sum-composable content digest proving both engines saw identical
    member sets — the split-manifest audit a training pipeline records
    before shipping data."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def tag(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = b["text"].to_pandas()
        bucket = np.empty(len(ids), np.int64)
        csum = np.empty(len(ids), np.int64)
        for i, (d, t) in enumerate(zip(ids, txt)):
            bucket[i] = int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:], "little") % 10
            csum[i] = int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little") % 1_000_003
        split = np.where(bucket < 8, "train", np.where(bucket == 8, "val", "test"))
        return pa.table(
            {
                "split": pa.array(split, pa.string()),
                "n_chars": b["n_chars"],
                "csum": pa.array(csum, pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("split")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="total_chars"),
            Sum("csum", alias_name="checksum"),
        )
        .to_pandas()
    )
    return (
        out.sort_values("split")
        .reset_index(drop=True)
        .astype({"split": "object", "n_docs": "int64", "total_chars": "int64", "checksum": "int64"})
    )

def sql_dataset_split() -> str:
    return """
WITH t AS (
  SELECT CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 < 8 THEN 'train'
              WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 = 8 THEN 'val'
              ELSE 'test' END AS split,
         n_chars,
         CAST(md5_number_lower(text) % 1000003 AS BIGINT) AS csum
  FROM documents)
SELECT split, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(csum) AS BIGINT) AS checksum
FROM t GROUP BY split
"""

TP_NEGATIVES = 20

def q_training_pairs(sf_dir: str) -> pd.DataFrame:
    """Contrastive training-pair generation for a retriever: positives =
    BM25 top-10 for the query; negatives = the first 20 non-positive
    docs in deterministic md5-hash order — the corpus-scale negative
    sampler (hash order ⇒ no shuffle, reproducible across engines and
    retried shards; each batch ships only its bottom-k candidates)."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    eng = _engine(sf_dir)
    seed_terms = list(dict.fromkeys(eng.analyze(QE_SEED)))
    res = eng.search_bm25(seed_terms, topk=None)
    pos = (
        pd.DataFrame({"doc_id": [d for d, _ in res], "s": [round(s, 6) for _, s in res]})
        .sort_values(["s", "doc_id"], ascending=[False, True])
        .head(10)["doc_id"]
        .tolist()
    )
    pos_set = set(pos)

    def cand(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.empty(len(ids), np.uint64)
        for i, d in enumerate(ids):
            h[i] = int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:], "little")
        keep = ~np.isin(ids, list(pos_set))
        ids, h = ids[keep], h[keep]
        o = np.lexsort((ids, h))[:TP_NEGATIVES]  # batch-local bottom-k
        return pa.table(
            {"doc_id": pa.array(ids[o], pa.int64()), "h": pa.array(h[o], pa.uint64())}
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    negs = ds.map_batches(cand, batch_format="pyarrow").to_pandas()
    negs = negs.sort_values(["h", "doc_id"]).head(TP_NEGATIVES)["doc_id"].tolist()
    out = pd.DataFrame(
        {
            "role": ["pos"] * len(pos) + ["neg"] * len(negs),
            "rank": list(range(1, len(pos) + 1)) + list(range(1, len(negs) + 1)),
            "doc_id": pos + negs,
        }
    )
    return out.astype({"role": "object", "rank": "int64", "doc_id": "int64"})

def sql_training_pairs() -> str:
    seed_vals = ", ".join(f"('{t}')" for t in ["fast", "scan"])
    return f"""
WITH {sql_tokens_cte()},
dls AS (SELECT doc_id, sum(tf) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
avgdl AS (SELECT sum(dl) / CAST((SELECT c FROM n) AS DOUBLE) AS v FROM dls),
q1(term) AS (VALUES {seed_vals}),
s1 AS ({_sql_bm25_scored("q1")}),
pos AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS BIGINT) AS rank
        FROM s1 QUALIFY rank <= 10),
neg AS (SELECT doc_id,
               CAST(row_number() OVER (ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rank
        FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM pos)
        QUALIFY rank <= {TP_NEGATIVES})
SELECT 'pos' AS role, rank, doc_id FROM pos
UNION ALL SELECT 'neg', rank, doc_id FROM neg
"""

PACK_CAP = 64  # bin capacity in tokens — spans both branches on the corpus

def q_doc_packing(sf_dir: str) -> pd.DataFrame:
    """Greedy NEXT-FIT sequence packing — the LLM-training step that
    concatenates documents into fixed-length context windows: docs are
    walked in doc_id order per source; a doc joins the open bin when it
    fits in ``PACK_CAP`` tokens, otherwise the bin closes and a new one
    opens; docs longer than the cap get a bin of their own and count as
    oversize. Tokens = space-separated count (``count(' ')+1``, both
    engines). Per-source packing is inherently sequential (like the LRU
    replay) so it runs as a stateful scan inside the source shuffle;
    the SQL oracle walks the identical recursion per source. Output per
    source: docs, tokens, bins, oversize and bin utilization."""
    import pyarrow as pa
    import ray.data as rd

    def tok(b: pa.Table) -> pa.Table:
        txt = b["text"].to_pandas().fillna("")
        tk = (txt.str.count(" ") + 1).to_numpy(np.int64)
        return pa.table(
            {
                "source": b["source"],
                "doc_id": b["doc_id"],
                "tk": pa.array(tk, pa.int64()),
            }
        )

    def pack(g: pa.Table) -> pa.Table:
        # Arrow-native reducer (round-5): the greedy first-fit scan is
        # inherently sequential (each bin depends on the previous), so
        # the per-doc loop stays — over doc COUNTS per source, driven
        # from a numpy view, no pandas conversion.
        dids = g["doc_id"].to_numpy(zero_copy_only=False)
        tks = g["tk"].to_numpy(zero_copy_only=False)[np.argsort(dids, kind="stable")]
        fill = bins = over = 0
        for t in tks:
            t = int(t)
            if t > PACK_CAP:
                bins += (1 if fill > 0 else 0) + 1
                fill = 0
                over += 1
            elif fill + t <= PACK_CAP:
                fill += t
            else:
                bins += 1
                fill = t
        nb = bins + (1 if fill > 0 else 0)
        tot = int(tks.sum())
        return pa.table(
            {
                "source": pa.array([str(g["source"][0].as_py())], pa.string()),
                "n_docs": pa.array([len(tks)], pa.int64()),
                "total_tokens": pa.array([tot], pa.int64()),
                "n_bins": pa.array([nb], pa.int64()),
                "n_oversize": pa.array([over], pa.int64()),
                "util": pa.array(
                    [float(round_half_away(tot / (nb * float(PACK_CAP)), 6))]
                    if nb
                    else [0.0],
                    pa.float64(),
                ),
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        )
        .map_batches(tok, batch_format="pyarrow")
        .groupby("source")
        .map_groups(pack, batch_format="pyarrow")
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )

def sql_doc_packing() -> str:
    return f"""
WITH RECURSIVE ranked AS (
  SELECT source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS idx,
         (length(text) - length(replace(text, ' ', '')) + 1) AS tk
  FROM documents),
nsrc AS (SELECT source, count(*) AS n, CAST(sum(tk) AS BIGINT) AS tot
         FROM ranked GROUP BY source),
rec(source, idx, fill, bins, oversize) AS (
  SELECT source, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0 AS BIGINT)
  FROM nsrc
  UNION ALL
  SELECT rec.source, rec.idx + 1,
    CASE WHEN r.tk > {PACK_CAP} THEN 0
         WHEN rec.fill + r.tk <= {PACK_CAP} THEN rec.fill + r.tk
         ELSE r.tk END,
    CASE WHEN r.tk > {PACK_CAP}
         THEN rec.bins + (CASE WHEN rec.fill > 0 THEN 1 ELSE 0 END) + 1
         WHEN rec.fill + r.tk <= {PACK_CAP} THEN rec.bins
         ELSE rec.bins + 1 END,
    rec.oversize + (CASE WHEN r.tk > {PACK_CAP} THEN 1 ELSE 0 END)
  FROM rec JOIN ranked r ON r.source = rec.source AND r.idx = rec.idx + 1),
fin AS (
  SELECT rec.source, fill, bins, oversize,
         row_number() OVER (PARTITION BY rec.source ORDER BY idx DESC) AS rn
  FROM rec)
SELECT f.source, n.n AS n_docs, n.tot AS total_tokens,
       CAST(f.bins + (CASE WHEN f.fill > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bins,
       f.oversize AS n_oversize,
       round(CAST(n.tot AS DOUBLE)
             / ((f.bins + (CASE WHEN f.fill > 0 THEN 1 ELSE 0 END))
                * {PACK_CAP}), 6) AS util
FROM fin f JOIN nsrc n USING (source)
WHERE f.rn = 1
ORDER BY f.source
"""

WORDPIECE_VOCAB: tuple[tuple[str, int], ...] = tuple(
    [(c, 0) for c in "abcdefghijklmnopqrstuvwxyz"]
    + [
        ("the", 0), ("re", 0), ("pro", 0), ("con", 0), ("un", 0),
        ("de", 0), ("an", 0), ("st", 0), ("wh", 0), ("gr", 0),
        ("tr", 0), ("qu", 0), ("br", 0), ("sh", 0), ("pl", 0),
    ]
    + [
        (p, 1)
        for p in (
            "s", "e", "t", "d", "n", "r", "y", "a", "o", "i", "l", "g",
            "ing", "ed", "er", "es", "tion", "ent", "ate", "ly", "al",
            "an", "ar", "st", "th", "le", "ct", "ss", "ve", "me", "nd",
            "ce", "us", "it", "ur", "ri", "ch", "te", "on", "in", "re",
            "se", "de", "om", "ut", "ck", "gh", "ph", "sp", "ld", "nt",
        )
    ]
)

def _wordpiece_tables() -> tuple[dict, dict, int]:
    start: dict[int, set] = {}
    cont: dict[int, set] = {}
    for p, c in WORDPIECE_VOCAB:
        (cont if c else start).setdefault(len(p), set()).add(p)
    maxlen = max(len(p) for p, _ in WORDPIECE_VOCAB)
    return start, cont, maxlen

def _wordpiece_encode(word: str, start: dict, cont: dict, maxlen: int) -> tuple[int, int]:
    """Greedy longest-match-first WordPiece: (n_pieces, is_unk)."""
    pos, n, L = 0, 0, len(word)
    while pos < L:
        table = start if pos == 0 else cont
        for plen in range(min(maxlen, L - pos), 0, -1):
            if word[pos : pos + plen] in table.get(plen, ()):
                pos += plen
                n += 1
                break
        else:
            return 1, 1
    return n, 0

def q_wordpiece_tokens(sf_dir: str) -> pd.DataFrame:
    """WordPiece subword tokenization audit — greedy longest-match-first
    encoding against a fixed vocabulary, the fertility/UNK-rate readout
    a tokenizer owner checks before training (pieces-per-token and the
    share of words the vocab cannot cover). The encode depends only on
    the WORD, so the corpus shuffles once to (source, word) counts and
    the greedy matcher runs over VOCABULARY-scale rows (the
    spell-correct compromise), never per occurrence. The SQL oracle
    replays the identical greedy recursion per distinct word with the
    vocab as a VALUES table."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..functions.textstats import _token_lists

    def rows(b: pa.Table) -> pa.Table:
        toks = _token_lists(b["text"].to_pandas())
        src = b["source"].to_pandas()
        srcs: list[str] = []
        words: list[str] = []
        for s, ts in zip(src, toks):
            srcs.extend([s] * len(ts))
            words.extend(ts)
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "word": pa.array(words, pa.string()),
            }
        )

    start, cont, maxlen = _wordpiece_tables()

    def encode(b: pa.Table) -> pa.Table:
        ws = b["word"].to_pylist()
        nt = np.empty(len(ws), np.int64)
        uk = np.empty(len(ws), np.int64)
        for i, w in enumerate(ws):
            nt[i], uk[i] = _wordpiece_encode(w, start, cont, maxlen)
        c = b["c"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": b["source"],
                "occ": b["c"],
                "wp": pa.array(c * nt, pa.int64()),
                "unk_occ": pa.array(c * uk, pa.int64()),
            }
        )

    from ._common import bucket_group_agg

    # (source, word)-cardinality groups → partition-bucket (DESIGN.md rule)
    per_src = (
        bucket_group_agg(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
            .map_batches(rows, batch_format="pyarrow"),
            ["source", "word"],
            {"c": ("word", "size")},
        )
        .map_batches(encode, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Count(alias_name="n_words"),
            Sum("occ", alias_name="n_tokens"),
            Sum("wp", alias_name="wp_tokens"),
            Sum("unk_occ", alias_name="unk_tokens"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    per_src["pieces_per_token"] = round_half_away(
        per_src["wp_tokens"].to_numpy(np.float64)
        / per_src["n_tokens"].to_numpy(np.float64),
        6,
    )
    return per_src.astype(
        {
            "source": "object",
            "n_words": "int64",
            "n_tokens": "int64",
            "wp_tokens": "int64",
            "unk_tokens": "int64",
        }
    )

def sql_wordpiece_tokens() -> str:
    vocab_rows = ", ".join(f"('{p}', {c})" for p, c in WORDPIECE_VOCAB)
    return rf"""
WITH RECURSIVE cnt AS (
  SELECT source, t AS word, count(*) AS c FROM (
    SELECT source,
           unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                     '[ \t\n\x0b\f\r]+')) AS t
    FROM documents)
  WHERE t <> ''
  GROUP BY source, t),
words AS (SELECT DISTINCT word FROM cnt),
vocab(piece, cont) AS (VALUES {vocab_rows}),
rec(word, pos, ntok) AS (
  SELECT word, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM words
  UNION ALL
  SELECT rec.word, rec.pos + length(m.piece), rec.ntok + 1
  FROM rec
  CROSS JOIN LATERAL (
      SELECT v.piece FROM vocab v
      WHERE ((rec.pos = 0 AND v.cont = 0) OR (rec.pos > 0 AND v.cont = 1))
        AND substr(rec.word, CAST(rec.pos AS INT) + 1, length(v.piece)) = v.piece
      ORDER BY length(v.piece) DESC LIMIT 1) m
  WHERE rec.pos < length(rec.word)),
fin AS (SELECT word, max(pos) AS mpos, max(ntok) AS ntok FROM rec GROUP BY word),
res AS (
  SELECT word,
         CASE WHEN mpos = length(word) THEN ntok ELSE 1 END AS ntok,
         CASE WHEN mpos = length(word) THEN 0 ELSE 1 END AS unk
  FROM fin)
SELECT c.source,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(c.c) AS BIGINT) AS n_tokens,
       CAST(sum(c.c * r.ntok) AS BIGINT) AS wp_tokens,
       CAST(sum(c.c * r.unk) AS BIGINT) AS unk_tokens,
       round(CAST(sum(c.c * r.ntok) AS DOUBLE) / CAST(sum(c.c) AS DOUBLE), 6)
         AS pieces_per_token
FROM cnt c JOIN res r USING (word)
GROUP BY c.source ORDER BY c.source
"""

BPE_TOP_WORDS = 30

BPE_MERGES = 8

def _toks_tf_batch(b):
    """Per-batch (term, tf) partials matching the oracle ``toks`` CTE
    (punct tokenize, '' and stopwords dropped): one row per unique
    token per batch — the combiner shape, nothing per-occurrence leaves
    the task."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..analysis.batch import PUNCT_ONLY, _tokenize_arrow

    toks = _tokenize_arrow(b["text"], PUNCT_ONLY)
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    if len(flat) == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "tf": pa.array([], pa.int64())}
        )
    vc = flat.value_counts()
    terms = np.asarray(vc.field("values").to_pylist(), dtype=object)
    cnt = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.array([t != "" and t not in STOP_WORDS for t in terms], dtype=bool)
    return pa.table(
        {
            "term": pa.array(terms[keep], pa.string()),
            "tf": pa.array(cnt[keep], pa.int64()),
        }
    )

def q_bpe_train(sf_dir: str) -> pd.DataFrame:
    """BPE tokenizer-merge training (the byte-pair-encoding loop under
    GPT-style vocabularies): word frequencies come from ONE distributed
    aggregation (the only corpus-sized step — exactly how production
    trainers shard the counting); the merge loop then runs on the tiny
    word-type table (top {BPE_TOP_WORDS} alphabetic words by count,
    ties by word). Each step counts non-overlapping occurrences of
    every adjacent symbol pair in space-padded word strings (weighted
    by word count), merges the (max-weight, lexicographically-least)
    pair left-to-right, and emits (step, pair, merged, weight). The
    SQL oracle replays the identical loop as LIST-state recursion —
    string ``replace`` has the same non-overlapping left-to-right
    semantics in both engines."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ._common import bucket_group_agg

    # vocab-cardinality groups → partition-bucket (DESIGN.md rule)
    counts = bucket_group_agg(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_toks_tf_batch, batch_format="pyarrow"),
        "term",
        {"n": ("tf", "sum")},
    ).to_pandas()
    counts = counts[counts["term"].str.fullmatch("[a-z]+")]
    counts = counts.sort_values(["n", "term"], ascending=[False, True]).head(
        BPE_TOP_WORDS
    )
    words = [" " + " ".join(w) + " " for w in counts["term"]]
    cnts = counts["n"].astype(int).tolist()

    rows = []
    for step in range(1, BPE_MERGES + 1):
        cand = set()
        for w in words:
            syms = w.split()
            for a, b in zip(syms, syms[1:]):
                cand.add(f" {a} {b} ")
        if not cand:
            break

        def weight(pat: str) -> int:
            return sum(c * w.count(pat) for w, c in zip(words, cnts))

        best, bw = None, 0
        for pat in sorted(cand):
            pw = weight(pat)
            if pw > bw:
                best, bw = pat, pw
        if best is None:
            break
        a, b = best.split()
        merged = a + b
        words = [w.replace(best, f" {merged} ") for w in words]
        rows.append((step, f"{a}+{b}", merged, bw))
    return pd.DataFrame(rows, columns=["step", "pair", "merged", "weight"]).astype(
        {"step": "int64", "weight": "int64"}
    )

def sql_bpe_train() -> str:
    W, M = BPE_TOP_WORDS, BPE_MERGES
    # weight of pair-pattern `p` against word/count lists (non-overlapping
    # replace-count semantics, identical to Python str.count)
    def wt(p_expr: str) -> str:
        return (
            "list_sum(list_transform(range(1, len(s.words) + 1), j -> "
            f"s.cnts[j] * ((length(s.words[j]) - length(replace(s.words[j], {p_expr}, ''))) "
            f"// length({p_expr}))))"
        )

    cand = (
        "list_distinct(flatten(list_transform(s.words, w -> "
        "list_transform(range(1, len(string_split(trim(w), ' '))), i -> "
        "' ' || string_split(trim(w), ' ')[i] || ' ' || "
        "string_split(trim(w), ' ')[i + 1] || ' '))))"
    )
    # best pair: max weight, ties by lexicographically-least pattern
    # (space sorts below letters, so pattern order == (a, b) tuple order).
    # Inlined everywhere — the documented DuckDB quirk: LATERAL lambdas
    # don't bind outer recursion columns.
    best = (
        f"list_min(list_filter({cand}, p -> {wt('p')} = "
        f"list_max(list_transform({cand}, p -> {wt('p')}))))"
    )
    wt_best = wt(best)
    return f"""
WITH RECURSIVE {sql_tokens_cte()},
wc AS (
  SELECT term, sum(tf) AS n FROM toks
  WHERE regexp_full_match(term, '[a-z]+')
  GROUP BY term ORDER BY n DESC, term LIMIT {W}),
init AS (
  SELECT list(' ' || list_aggregate(string_split(term, ''), 'string_agg', ' ') || ' '
              ORDER BY n DESC, term) AS words,
         list(CAST(n AS BIGINT) ORDER BY n DESC, term) AS cnts
  FROM wc),
bpe(step, words, cnts, pair, merged, weight) AS (
  SELECT 0, words, cnts, '', '', CAST(0 AS BIGINT) FROM init
  UNION ALL
  SELECT s.step + 1,
         list_transform(s.words, w ->
           replace(w, {best}, ' ' || replace(trim({best}), ' ', '') || ' ')),
         s.cnts,
         string_split(trim({best}), ' ')[1] || '+' ||
           string_split(trim({best}), ' ')[2],
         replace(trim({best}), ' ', ''),
         CAST({wt_best} AS BIGINT)
  FROM bpe s
  WHERE s.step < {M} AND {best} IS NOT NULL AND {wt_best} > 0)
SELECT CAST(step AS BIGINT) AS step, pair, merged, CAST(weight AS BIGINT) AS weight
FROM bpe WHERE step > 0 ORDER BY step
"""

def q_bpe_apply(sf_dir: str) -> pd.DataFrame:
    """Tokenizer fertility audit under the LEARNED BPE merges (the
    metric tokenizer teams track per language/source): the merge table
    comes from `bpe_train`, broadcast to every task; one corpus pass
    applies the merges in rank order to each unique alphabetic token
    (memoized per task — Zipfian vocab makes that O(vocab)) and sums
    per source: word occurrences, chars (= symbols before), symbols
    after, fertility = symbols/word and compression = chars/symbol at
    6dp. Applying a merge is the same non-overlapping left-to-right
    ``replace`` the trainer used, so the oracle replays it with
    unrolled stages over its own recomputed merge table."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    merges = [
        (f" {p.replace('+', ' ')} ", f" {m} ")
        for p, m in zip(*(q_bpe_train(sf_dir)[c] for c in ("pair", "merged")))
    ]

    def per_batch(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..analysis.batch import PUNCT_ONLY, _tokenize_arrow

        toks = _tokenize_arrow(b["text"], PUNCT_ONLY)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        src = b["source"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_words": pa.array([], pa.int64()),
                "chars": pa.array([], pa.int64()),
                "symbols": pa.array([], pa.int64()),
            }
        )
        if len(flat) == 0:
            return empty
        dic = pc.dictionary_encode(flat)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.asarray(dic.dictionary.to_pylist(), dtype=object)
        import re as _re

        ok_u = np.array(
            [bool(_re.fullmatch("[a-z]+", u)) and u not in STOP_WORDS for u in uniq],
            dtype=bool,
        )

        def n_sym(word: str) -> int:
            w = " " + " ".join(word) + " "
            for pat, rep in merges:
                w = w.replace(pat, rep)
            return len(w.split())

        sym_u = np.array([n_sym(u) if ok else 0 for u, ok in zip(uniq, ok_u)], np.int64)
        len_u = np.array([len(u) for u in uniq], np.int64)
        doc_rep = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        ok = ok_u[codes]
        g = (
            pd.DataFrame(
                {
                    "source": src[doc_rep[ok]],
                    "chars": len_u[codes[ok]],
                    "symbols": sym_u[codes[ok]],
                }
            )
            .groupby("source", as_index=False)
            .agg(n_words=("chars", "size"), chars=("chars", "sum"), symbols=("symbols", "sum"))
        )
        return pa.table(
            {
                "source": pa.array(g["source"].to_numpy(object), pa.string()),
                "n_words": pa.array(g["n_words"].to_numpy(np.int64), pa.int64()),
                "chars": pa.array(g["chars"].to_numpy(np.int64), pa.int64()),
                "symbols": pa.array(g["symbols"].to_numpy(np.int64), pa.int64()),
            }
        )

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])
        .map_batches(per_batch, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_words", alias_name="n_words"),
            Sum("chars", alias_name="chars"),
            Sum("symbols", alias_name="symbols"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["fertility"] = round_half_away(out["symbols"] / out["n_words"], 6)
    out["compression"] = round_half_away(out["chars"] / out["symbols"], 6)
    return out.astype({"n_words": "int64", "chars": "int64", "symbols": "int64"})

def sql_bpe_apply() -> str:
    # recompute the merge table with the bpe_train oracle, then apply the
    # merges in rank order as unrolled replace stages; a missing step k
    # degrades to a never-matching pattern (chr(1)).
    bpe_cte = sql_bpe_train().strip().rstrip('"').strip()
    # strip the trailing SELECT of the trainer oracle; keep its WITH body
    bpe_body = bpe_cte[: bpe_cte.rindex("SELECT CAST(step AS BIGINT)")].rstrip().rstrip(",")
    stages = []
    prev = "w0"
    for k in range(1, BPE_MERGES + 1):
        stages.append(
            f"""w{k} AS (
  SELECT source, cnt, chars,
         replace(p, coalesce((SELECT ' ' || replace(pair, '+', ' ') || ' '
                              FROM bpe WHERE step = {k}), chr(1)),
                 coalesce((SELECT ' ' || merged || ' ' FROM bpe WHERE step = {k}),
                          chr(1))) AS p
  FROM {prev})"""
        )
        prev = f"w{k}"
    return f"""{bpe_body},
wordsrc AS (
  SELECT d.source, t AS word, count(*) AS cnt
  FROM (SELECT source,
               unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                         '[ \t\n\x0b\f\r]+')) AS t
        FROM documents) d
  WHERE t <> '' AND t NOT IN ({_stoplist_sql()})
    AND regexp_full_match(t, '[a-z]+')
  GROUP BY 1, 2),
w0 AS (
  SELECT source, cnt, length(word) AS chars,
         ' ' || list_aggregate(string_split(word, ''), 'string_agg', ' ') || ' ' AS p
  FROM wordsrc),
{",".join(stages)},
fin AS (
  SELECT source, sum(cnt) AS n_words, sum(cnt * chars) AS chars,
         sum(cnt * len(string_split(trim(p), ' '))) AS symbols
  FROM {prev} GROUP BY source)
SELECT source, CAST(n_words AS BIGINT) AS n_words, CAST(chars AS BIGINT) AS chars,
       CAST(symbols AS BIGINT) AS symbols,
       round(symbols * 1.0 / n_words, 6) AS fertility,
       round(chars * 1.0 / symbols, 6) AS compression
FROM fin ORDER BY source
"""

MIX_BUDGET_FRAC = 0.5  # token budget = half the corpus

MIX_MAX_EPOCHS = 2.0

def q_data_mixture(sf_dir: str) -> pd.DataFrame:
    """Training-data mixture solver (the source-weighting step of every
    LLM data pipeline — temperature-sampled mixing à la multilingual
    BERT/PaLM): per-source token counts come from ONE distributed
    aggregation; sampling weight ∝ √n (temperature 0.5) allocates a
    token budget of {MIX_BUDGET_FRAC}×corpus, and water-filling clips
    any source above {MIX_MAX_EPOCHS} epochs, redistributing its
    surplus over the rest until stable (the driver loop is
    O(#sources²) on a #sources-row table). The oracle replays the
    clip loop as LIST-state recursion."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    per = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])
        .map_batches(_source_token_counts, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_part", alias_name="n_tokens"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    names = per["source"].tolist()
    ns = per["n_tokens"].astype(float).to_numpy()
    total = float(ns.sum())
    budget = MIX_BUDGET_FRAC * total
    clipped = np.zeros(len(ns), dtype=bool)
    rem = budget
    for _ in range(len(ns)):
        denom = float(np.sqrt(ns[~clipped]).sum())
        alloc = rem * np.sqrt(ns) / denom
        newly = (~clipped) & (alloc > MIX_MAX_EPOCHS * ns)
        if not newly.any():
            break
        rem -= MIX_MAX_EPOCHS * float(ns[newly].sum())
        clipped |= newly
    denom = float(np.sqrt(ns[~clipped]).sum())
    alloc = np.where(clipped, MIX_MAX_EPOCHS * ns, rem * np.sqrt(ns) / denom)
    out = pd.DataFrame(
        {
            "source": names,
            "n_tokens": per["n_tokens"].astype("int64"),
            "weight": round_half_away(np.sqrt(ns) / float(np.sqrt(ns).sum()), 6),
            "alloc_tokens": round_half_away(alloc, 6),
            "epochs": round_half_away(alloc / ns, 6),
            "clipped": clipped.astype("int64"),
        }
    )
    return out

def _source_token_counts(b):
    """Per-batch kept-token counts per source (matches the toks CTE)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..analysis.batch import PUNCT_ONLY, _tokenize_arrow

    toks = _tokenize_arrow(b["text"], PUNCT_ONLY)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    src = b["source"].to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return pa.table(
            {"source": pa.array([], pa.string()), "n_part": pa.array([], pa.int64())}
        )
    dic = pc.dictionary_encode(flat)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = np.asarray(dic.dictionary.to_pylist(), dtype=object)
    keep = np.array([u != "" and u not in STOP_WORDS for u in uniq], dtype=bool)[codes]
    doc_rep = np.repeat(np.arange(len(b), dtype=np.int64), counts)
    g = (
        pd.DataFrame({"source": src[doc_rep[keep]]})
        .groupby("source", as_index=False)
        .size()
    )
    return pa.table(
        {
            "source": pa.array(g["source"].to_numpy(object), pa.string()),
            "n_part": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
        }
    )

def sql_data_mixture() -> str:
    E = MIX_MAX_EPOCHS
    F = MIX_BUDGET_FRAC
    # denom over unclipped sources given state lists
    denom = (
        "list_sum(list_transform(range(1, len(s.ns) + 1), i -> "
        "CASE WHEN s.clip[i] THEN 0.0 ELSE sqrt(CAST(s.ns[i] AS DOUBLE)) END))"
    )
    newly = (
        f"list_transform(range(1, len(s.ns) + 1), i -> "
        f"NOT s.clip[i] AND s.rem * sqrt(CAST(s.ns[i] AS DOUBLE)) / {denom} "
        f"> {E} * s.ns[i])"
    )
    return rf"""
WITH RECURSIVE raw AS (
  SELECT d.source, t
  FROM (SELECT source,
               unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                         '[ \t\n\x0b\f\r]+')) AS t
        FROM documents d) d
  WHERE t <> '' AND t NOT IN ({_stoplist_sql()})),
per AS (SELECT source, count(*) AS n FROM raw GROUP BY source),
init AS (
  SELECT list(source ORDER BY source) AS names,
         list(CAST(n AS BIGINT) ORDER BY source) AS ns
  FROM per),
mix(step, names, ns, clip, rem) AS (
  SELECT 0, names, ns,
         list_transform(ns, x -> FALSE),
         {F} * list_sum(list_transform(ns, x -> CAST(x AS DOUBLE)))
  FROM init
  UNION ALL
  SELECT s.step + 1, s.names, s.ns,
         list_transform(range(1, len(s.ns) + 1), i ->
           s.clip[i] OR ({newly})[i]),
         s.rem - {E} * list_sum(list_transform(range(1, len(s.ns) + 1), i ->
           CASE WHEN ({newly})[i] THEN CAST(s.ns[i] AS DOUBLE) ELSE 0.0 END))
  FROM mix s
  WHERE s.step < len(s.ns)
    AND list_sum(list_transform({newly}, b -> CASE WHEN b THEN 1 ELSE 0 END)) > 0),
fin AS (SELECT * FROM mix ORDER BY step DESC LIMIT 1),
denomf AS (
  SELECT list_sum(list_transform(range(1, len(f.ns) + 1), i ->
           CASE WHEN f.clip[i] THEN 0.0 ELSE sqrt(CAST(f.ns[i] AS DOUBLE)) END)) AS d,
         list_sum(list_transform(f.ns, x -> sqrt(CAST(x AS DOUBLE)))) AS dall
  FROM fin f),
rows AS (
  SELECT f.names[u.i] AS source, f.ns[u.i] AS n_tokens,
         sqrt(CAST(f.ns[u.i] AS DOUBLE)) / denomf.dall AS weight,
         CASE WHEN f.clip[u.i] THEN {E} * f.ns[u.i]
              ELSE f.rem * sqrt(CAST(f.ns[u.i] AS DOUBLE)) / denomf.d END AS alloc,
         CASE WHEN f.clip[u.i] THEN 1 ELSE 0 END AS clipped
  FROM fin f, denomf, unnest(range(1, len(f.ns) + 1)) AS u(i))
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(weight, 6) AS weight,
       round(alloc, 6) AS alloc_tokens,
       round(alloc / n_tokens, 6) AS epochs,
       CAST(clipped AS BIGINT) AS clipped
FROM rows ORDER BY source
"""

LEAK_SHINGLE_K = 3

def q_split_leakage(sf_dir: str) -> pd.DataFrame:
    """Train→validation contamination audit (the WITHIN-corpus
    counterpart of `decontaminate`'s external-benchmark probe): under
    the `dataset_split` hash rule (md5(doc_id) % 10 → 8/1/1), every
    val doc's word {LEAK_SHINGLE_K}-gram shingles probe the full train
    shingle set — one distinct-shingle Dataset per side, ONE native
    hash join on the shingle, per-doc leak counts from a tiny groupby.
    Output per val doc: shingles, leaked shingles, leak share."""
    import hashlib as _hl

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    def shingles(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..analysis.batch import PUNCT_ONLY, _tokenize_arrow

        toks = _tokenize_arrow(b["text"], PUNCT_ONLY)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_s, out_d, out_split = [], [], []
        for did, ts in zip(ids, toks.to_pylist()):
            kept = [t for t in ts if t and t not in STOP_WORDS]
            bucket = (
                int.from_bytes(_hl.md5(str(did).encode()).digest()[8:], "little") % 10
            )
            split = "train" if bucket < 8 else ("val" if bucket == 8 else "test")
            if split == "test":
                continue
            sh = {
                " ".join(kept[i : i + LEAK_SHINGLE_K])
                for i in range(len(kept) - LEAK_SHINGLE_K + 1)
            }
            out_s.extend(sh)
            out_d.extend([did] * len(sh))
            out_split.extend([split] * len(sh))
        return pa.table(
            {
                "shingle": pa.array(out_s, pa.string()),
                "doc_id": pa.array(np.asarray(out_d, np.int64), pa.int64()),
                "split": pa.array(out_split, pa.string()),
            }
        )

    sh = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(shingles, batch_format="pyarrow")
        .materialize()
    )
    train_sh = (
        sh.filter(lambda r: r["split"] == "train")
        .select_columns(["shingle"])
        .groupby("shingle")
        .count()
        .select_columns(["shingle"])
    )
    val = sh.filter(lambda r: r["split"] == "val").select_columns(
        ["shingle", "doc_id"]
    )
    leaked = (
        val.join(train_sh, join_type="inner", num_partitions=8, on=("shingle",))
        .groupby("doc_id")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_leaked"})
    )
    totals = (
        val.groupby("doc_id")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_shingles"})
    )
    out = totals.merge(leaked, on="doc_id", how="left")
    out["n_leaked"] = out["n_leaked"].fillna(0).astype("int64")
    out["leak_share"] = round_half_away(out["n_leaked"] / out["n_shingles"], 6)
    return (
        out.sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "n_shingles": "int64"})
    )

def sql_split_leakage() -> str:
    K = LEAK_SHINGLE_K
    return rf"""
WITH tl AS (
  SELECT doc_id,
         md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 AS bucket,
         list_filter(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                        '[ \t\n\x0b\f\r]+'),
                     t -> t <> '' AND t NOT IN ({_stoplist_sql()})) AS ts
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, bucket,
         ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS shingle
  FROM tl, LATERAL unnest(range(1, len(ts) - {K} + 2)) AS u(i)
  WHERE len(ts) >= {K}),
train_sh AS (SELECT DISTINCT shingle FROM sh WHERE bucket < 8),
val AS (SELECT doc_id, shingle FROM sh WHERE bucket = 8),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM val GROUP BY doc_id),
leak AS (
  SELECT v.doc_id, count(*) AS n_leaked
  FROM val v JOIN train_sh USING (shingle) GROUP BY v.doc_id)
SELECT t.doc_id, CAST(t.n_shingles AS BIGINT) AS n_shingles,
       CAST(coalesce(l.n_leaked, 0) AS BIGINT) AS n_leaked,
       round(coalesce(l.n_leaked, 0) * 1.0 / t.n_shingles, 6) AS leak_share
FROM tot t LEFT JOIN leak l USING (doc_id)
ORDER BY t.doc_id
"""
