"""Text analysis / curation: token stats, quality, lang-id, PII, decontamination.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS
from ._common import _raw_tokens_cte, _stoplist_sql, round_half_away  # noqa: F401


def q_token_stats(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from ..functions.textstats import token_stats_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(token_stats_batch, batch_format="pyarrow").to_pandas()

def sql_token_stats() -> str:
    stoplist_en = ", ".join("'" + w + "'" for w in sorted(EN_STOP_WORDS))
    return rf"""
WITH raw AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                     '[ \t\n\x0b\f\r]+')) AS t
    FROM documents
)
SELECT d.doc_id,
       coalesce(count(r.t), 0) AS n_tokens,
       CAST(coalesce(sum(CASE WHEN r.t IN ({stoplist_en}) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_stop,
       coalesce(count(DISTINCT r.t), 0) AS n_distinct
FROM documents d LEFT JOIN (SELECT * FROM raw WHERE t <> '') r USING (doc_id)
GROUP BY d.doc_id
"""

def sql_quality_scores() -> str:
    return f"""
WITH {_raw_tokens_cte()}
SELECT p.doc_id,
       round(p.n_stop / greatest(p.n_tokens, 1.0), 6) AS stop_ratio,
       round((length(d.text) - length(regexp_replace(d.text, '[,.;?!]', '', 'g')))
             / greatest(length(d.text), 1.0), 6) AS punct_ratio,
       round(p.tok_chars / greatest(p.n_tokens, 1.0), 6) AS mean_token_len,
       round(0.4 * (p.n_stop / greatest(p.n_tokens, 1.0))
             + 0.4 * least(1.0, p.n_tokens / 100.0)
             + 0.2 * (1.0 - (length(d.text) - length(regexp_replace(d.text, '[,.;?!]', '', 'g')))
                            / greatest(length(d.text), 1.0)), 6) AS quality
FROM per_doc p JOIN documents d USING (doc_id)
"""

def sql_lang_id() -> str:
    return f"""
WITH {_raw_tokens_cte()}
SELECT p.doc_id,
       CASE WHEN regexp_matches(d.text, '[ぁ-ヿ一-鿿]') THEN 'ja'
            WHEN p.n_stop / greatest(p.n_tokens, 1.0) >= 0.05 THEN 'en'
            ELSE 'other' END AS lang_pred
FROM per_doc p JOIN documents d USING (doc_id)
"""

def q_quality_scores(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from ..functions.textstats import quality_score_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pyarrow").to_pandas()

def q_lang_id(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from ..functions.textstats import lang_id_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(lang_id_batch, batch_format="pyarrow").to_pandas()

def q_fingerprint(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from ..functions.textstats import fingerprint_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(fingerprint_batch, batch_format="pyarrow").to_pandas()
    return out[["doc_id", "md5"]]

def sql_fingerprint() -> str:
    return "SELECT doc_id, md5(text) AS md5 FROM documents"

def q_curation(sf_dir: str) -> pd.DataFrame:
    """Composite training-data curation pipeline: quality-filter +
    language-filter + exact-dedup in ONE streaming pass + one groupby —
    the canonical use of the functions/ ops chained as Dataset stages."""
    import pyarrow as pa
    import ray.data as rd

    from ..functions.dedup import add_content_hash
    from ..functions.textstats import lang_id_batch, quality_score_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def annotate(batch: pa.Table) -> pa.Table:
        q = quality_score_batch(batch)
        lang = lang_id_batch(batch)
        out = add_content_hash(batch)
        out = out.append_column("quality", q["quality"])
        return out.append_column("lang_pred", lang["lang_pred"])

    import pyarrow.compute as pc

    filtered = ds.map_batches(annotate, batch_format="pyarrow").map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["quality"], 0.5), pc.equal(t["lang_pred"], "en"))
        ),
        batch_format="pyarrow",
    )

    from ._common import bucket_group_agg

    # distinct-text-cardinality groups → partition-bucket (DESIGN.md rule)
    out = (
        bucket_group_agg(filtered, "content_hash", {"doc_id": ("doc_id", "min")})
        .to_pandas()[["doc_id"]]
    )
    return out.astype({"doc_id": "int64"}).sort_values("doc_id").reset_index(drop=True)

def sql_curation() -> str:
    return f"""
WITH {_raw_tokens_cte()},
scored AS (
    SELECT p.doc_id,
           round(0.4 * (p.n_stop / greatest(p.n_tokens, 1.0))
                 + 0.4 * least(1.0, p.n_tokens / 100.0)
                 + 0.2 * (1.0 - (length(d.text) - length(regexp_replace(d.text, '[,.;?!]', '', 'g')))
                                / greatest(length(d.text), 1.0)), 6) AS quality,
           CASE WHEN regexp_matches(d.text, '[ぁ-ヿ一-鿿]') THEN 'ja'
                WHEN p.n_stop / greatest(p.n_tokens, 1.0) >= 0.05 THEN 'en'
                ELSE 'other' END AS lang_pred,
           d.text
    FROM per_doc p JOIN documents d USING (doc_id)
)
SELECT min(doc_id) AS doc_id FROM scored
WHERE quality >= 0.5 AND lang_pred = 'en'
GROUP BY text
"""

DECON_N = 4  # tiny synthetic vocab → short grams; production uses 8-13

def q_pii_redact(sf_dir: str) -> pd.DataFrame:
    """PII scrub: redact emails then phones (Arrow RE2 kernels — the
    same regex engine DuckDB uses), count removals. The PII itself is
    planted deterministically (the test tables contain none), the
    redaction pipeline is what's verified."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from searchengine_ray.functions.pii import redact_pii

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def plant(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        txt = b["text"].to_pandas()
        mask = ids % 7 == 0
        suffix = " contact u" + pd.Series(ids).astype(str) + "@ex.com call 555-123-4567"
        txt = txt.where(~mask, txt + suffix)
        return pa.table({"doc_id": b["doc_id"], "text": pa.array(txt, pa.string())})

    out = redact_pii(ds.map_batches(plant, batch_format="pyarrow")).to_pandas()
    out["redacted"] = out["redacted"].astype(str)
    return out[["doc_id", "redacted", "n_emails", "n_phones"]].astype(
        {"doc_id": "int64", "n_emails": "int64", "n_phones": "int64"}
    )

def sql_pii_redact() -> str:
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
    return f"""
WITH planted AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
                      THEN ' contact u' || doc_id || '@ex.com call 555-123-4567'
                      ELSE '' END AS text
  FROM documents
), e AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
  FROM planted
)
SELECT doc_id,
       regexp_replace(t1, '{phone}', '<PHONE>', 'g') AS redacted,
       n_emails,
       CAST(len(regexp_extract_all(t1, '{phone}')) AS BIGINT) AS n_phones
FROM e
"""

def q_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: corpus docs sharing any {DECON_N}-gram
    with the benchmark subset (doc_id % 97 == 0). Benchmark gram set is
    broadcast once; the corpus streams through one membership probe."""
    import ray.data as rd

    from searchengine_ray.functions.decontaminate import (
        benchmark_gram_set,
        contaminated_ids,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    import pyarrow as pa
    import pyarrow.compute as pc

    def split(b: pa.Table, keep_bench: bool) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        m = pa.array(ids % 97 == 0)
        return b.filter(m if keep_bench else pc.invert(m))

    bench = docs.map_batches(split, batch_format="pyarrow", fn_kwargs={"keep_bench": True})
    corpus = docs.map_batches(split, batch_format="pyarrow", fn_kwargs={"keep_bench": False})
    grams = benchmark_gram_set(bench, n=DECON_N)
    out = contaminated_ids(corpus, grams, n=DECON_N).to_pandas()
    return (
        out.drop_duplicates()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64"})
    )

def sql_decontaminate() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(l) AS t, unnest(range(1, len(l)+1)) AS pos
  FROM (SELECT doc_id,
               string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                  '[ \t\n\x0b\f\r]+') AS l
        FROM documents)
), seq AS (
  SELECT doc_id, list(t ORDER BY pos) AS l
  FROM tok WHERE t <> '' AND t NOT IN ({{stoplist}})
  GROUP BY doc_id
), grams AS (
  SELECT doc_id,
         unnest([array_to_string(l[x:x+{DECON_N}-1], ' ')
                 FOR x IN range(1, len(l)-{DECON_N}+2)]) AS gram
  FROM seq
)
SELECT DISTINCT g.doc_id FROM grams g
JOIN (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0) b USING (gram)
WHERE g.doc_id % 97 <> 0
""".replace("{stoplist}", _stoplist_sql())

def q_gopher_quality(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition/quality filters (Rae et al. 2021 §A1.1):
    per-doc word stats + dup-word / top-word / top-bigram fractions and
    the accept decision — one vectorized map_batches, no shuffle."""
    import ray.data as rd

    from searchengine_ray.functions.gopher import gopher_metrics_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(gopher_metrics_batch, batch_format="pyarrow").to_pandas()

def sql_gopher_quality() -> str:
    return r"""
WITH tok AS (
  SELECT doc_id, unnest(l) AS t, unnest(range(1, len(l)+1)) AS pos
  FROM (SELECT doc_id,
               string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                  '[ \t\n\x0b\f\r]+') AS l
        FROM documents)
), ftok AS (
  SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM tok WHERE t <> ''
), wc AS (
  SELECT doc_id, t, count(*) AS c FROM ftok GROUP BY 1, 2
), wagg AS (
  SELECT doc_id, sum(c) AS n, max(c) AS topc, count(*) AS nd,
         sum(c * length(t)) AS chars
  FROM wc GROUP BY 1
), big AS (
  SELECT a.doc_id, a.t AS t1, b.t AS t2, count(*) AS c
  FROM ftok a JOIN ftok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
  GROUP BY 1, 2, 3
), bagg AS (
  SELECT doc_id, max(c) AS topb, sum(c) AS nb FROM big GROUP BY 1
), m AS (
  SELECT d.doc_id,
         coalesce(w.n, 0) AS n_words,
         coalesce(w.chars, 0) / greatest(coalesce(w.n, 0), 1.0) AS mean_word_len,
         1.0 - coalesce(w.nd, 0) / greatest(coalesce(w.n, 0), 1.0) AS dup_word_frac,
         coalesce(w.topc, 0) / greatest(coalesce(w.n, 0), 1.0) AS top_word_frac,
         coalesce(b.topb, 0) / greatest(coalesce(b.nb, 0), 1.0) AS top_bigram_frac
  FROM documents d
  LEFT JOIN wagg w USING (doc_id) LEFT JOIN bagg b USING (doc_id)
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       round(mean_word_len, 6) AS mean_word_len,
       round(dup_word_frac, 6) AS dup_word_frac,
       round(top_word_frac, 6) AS top_word_frac,
       round(top_bigram_frac, 6) AS top_bigram_frac,
       CAST(n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND dup_word_frac <= 0.60
            AND top_word_frac <= 0.30
            AND top_bigram_frac <= 0.18 AS BIGINT) AS keep
FROM m
"""

BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"

def q_bpe_pretokenize(sf_dir: str) -> pd.DataFrame:
    """Token-budget estimation: count GPT-2-style pre-tokenizer matches
    per doc (the standard first stage of BPE tokenization) with Arrow's
    RE2 kernel — one streaming pass, zero Python in the hot loop."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    def count(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b["text"], BPE_PRETOKEN_RE)
        return pa.table({"doc_id": b["doc_id"], "n_pretokens": n.cast(pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(count, batch_format="pyarrow").to_pandas()

def sql_bpe_pretokenize() -> str:
    return (
        "SELECT doc_id, CAST(len(regexp_extract_all(text, '"
        + BPE_PRETOKEN_RE.replace("'", "''")
        + "')) AS BIGINT) AS n_pretokens FROM documents"
    )

def q_unigram_logppl(sf_dir: str) -> pd.DataFrame:
    """Unigram log-perplexity per doc (LLM-data fluency/outlier filter):
    corpus unigram model from two streaming aggregates, broadcast once,
    score = mean −ln p(token) (functions/textstats.py)."""
    import ray.data as rd

    from searchengine_ray.functions.textstats import unigram_logppl

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return unigram_logppl(ds)

def sql_unigram_logppl() -> str:
    return r"""
WITH tok AS (
  SELECT doc_id, t FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                     '[ \t\n\x0b\f\r]+')) AS t
    FROM documents)
  WHERE t <> ''),
cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok)
SELECT d.doc_id,
       coalesce(round(avg(-ln(cnt.c / tot.n)), 6), 0.0) AS logppl
FROM documents d
LEFT JOIN tok ON tok.doc_id = d.doc_id
LEFT JOIN cnt ON cnt.t = tok.t
CROSS JOIN tot
GROUP BY d.doc_id
"""

def q_sentence_stats(sf_dir: str) -> pd.DataFrame:
    """Sentence segmentation + readability proxy per source: split on
    [.?!], count sentences and words, emit avg sentences/doc and
    words/sentence (the Flesch-style building blocks). Stateless
    vectorized kernels; one source-cardinality groupby of integer
    partials."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def stats(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pandas().fillna("")
        sents = texts.str.split(r"[.?!]", regex=True).map(
            lambda ps: [p for p in ps if p.strip()]
        )
        n_sent = sents.map(len).to_numpy(np.int64)
        n_words = sents.map(
            lambda ps: sum(len([w for w in p.split() if w]) for p in ps)
        ).to_numpy(np.int64)
        return pa.table(
            {
                "source": b["source"],
                "n_sent": pa.array(n_sent, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
            }
        )

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(stats, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_sent", alias_name="sents"),
            Sum("n_words", alias_name="words"),
        )
        .to_pandas()
    )
    out["sent_per_doc"] = round_half_away(out["sents"] / out["n_docs"])
    out["words_per_sent"] = round_half_away(out["words"] / np.maximum(out["sents"], 1))
    out = out.sort_values("source").reset_index(drop=True)
    return out[["source", "n_docs", "sents", "words", "sent_per_doc", "words_per_sent"]].astype(
        {"source": "object", "n_docs": "int64", "sents": "int64", "words": "int64"}
    )

def sql_sentence_stats() -> str:
    return r"""
WITH seg AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '[.?!]'), p -> trim(p) <> '')) AS n_sent,
         len(list_filter(
             flatten(list_transform(
                 list_filter(string_split_regex(text, '[.?!]'), p -> trim(p) <> ''),
                 p -> string_split_regex(p, '[ \t\n\x0b\f\r]+'))),
             w -> w <> '')) AS n_words
  FROM documents)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_sent) AS BIGINT) AS sents, CAST(sum(n_words) AS BIGINT) AS words,
       round(sum(n_sent) / CAST(count(*) AS DOUBLE), 6) AS sent_per_doc,
       round(sum(n_words) / CAST(greatest(sum(n_sent), 1) AS DOUBLE), 6) AS words_per_sent
FROM seg GROUP BY source
"""

def q_readability(sf_dir: str) -> pd.DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per source: sentences
    split on [.?!], words on whitespace, syllables = vowel-group count
    ([aeiouy]+ runs, the classic heuristic). All three are exact
    integer partials summed in one source-cardinality groupby; the two
    scores are identical closed forms over the integer ratios on both
    engines. Extends ``sentence_stats`` with the syllable axis and the
    named scores."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def stats(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pandas().fillna("")
        sents = texts.str.split(r"[.?!]", regex=True).map(
            lambda ps: sum(1 for p in ps if p.strip())
        ).to_numpy(np.int64)
        words = texts.str.split(r"[ \t\n\x0b\f\r]+", regex=True).map(
            lambda ws: sum(1 for w in ws if w)
        ).to_numpy(np.int64)
        sylls = texts.str.lower().str.count(r"[aeiouy]+").to_numpy(np.int64)
        return pa.table(
            {
                "source": b["source"],
                "n_sent": pa.array(sents, pa.int64()),
                "n_words": pa.array(words, pa.int64()),
                "n_syll": pa.array(sylls, pa.int64()),
            }
        )

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(stats, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_sent", alias_name="sents"),
            Sum("n_words", alias_name="words"),
            Sum("n_syll", alias_name="sylls"),
        )
        .to_pandas()
    )
    wps = out["words"].to_numpy(np.float64) / np.maximum(out["sents"], 1)
    spw = out["sylls"].to_numpy(np.float64) / np.maximum(out["words"], 1)
    out["flesch_ease"] = round_half_away(206.835 - 1.015 * wps - 84.6 * spw)
    out["fk_grade"] = round_half_away(0.39 * wps + 11.8 * spw - 15.59)
    out = out.sort_values("source").reset_index(drop=True)
    return out[
        ["source", "n_docs", "sents", "words", "sylls", "flesch_ease", "fk_grade"]
    ].astype(
        {
            "source": "object",
            "n_docs": "int64",
            "sents": "int64",
            "words": "int64",
            "sylls": "int64",
        }
    )

def sql_readability() -> str:
    return r"""
WITH seg AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '[.?!]'), p -> trim(p) <> '')) AS n_sent,
         len(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), w -> w <> '')) AS n_words,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
  FROM documents),
agg AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_sent) AS BIGINT) AS sents,
         CAST(sum(n_words) AS BIGINT) AS words,
         CAST(sum(n_syll) AS BIGINT) AS sylls
  FROM seg GROUP BY source)
SELECT source, n_docs, sents, words, sylls,
       round(206.835 - 1.015 * (words / CAST(greatest(sents, 1) AS DOUBLE))
                     - 84.6 * (sylls / CAST(greatest(words, 1) AS DOUBLE)), 6)
         AS flesch_ease,
       round(0.39 * (words / CAST(greatest(sents, 1) AS DOUBLE))
             + 11.8 * (sylls / CAST(greatest(words, 1) AS DOUBLE)) - 15.59, 6)
         AS fk_grade
FROM agg
"""
