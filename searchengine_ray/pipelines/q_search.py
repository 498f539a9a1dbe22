"""Boolean / phrase / prefix / fuzzy retrieval pipelines over the inverted index.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS
from ._common import BM25_QUERY, CACHE_ROOT, DELETE_KW, SEARCH_KW, SQL_TOKENS_CTE, _engine, _sql_bm25_scored, _stoplist_sql, documents_index, q_term_stats, round_half_away, sql_bm25_all, sql_tokens_cte  # noqa: F401


KEYWORD = "join"

AND_TERMS = ["join", "window", "merge"]

OR_TERMS = ["merge", "zebra"]

PHRASE = "table hash"

def q_keyword_search(sf_dir: str) -> pd.DataFrame:
    ids = _engine(sf_dir).search_keyword(KEYWORD)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})

def sql_keyword_search() -> str:
    return f"""
WITH {sql_tokens_cte()}
SELECT DISTINCT doc_id FROM toks WHERE term = '{KEYWORD}'
"""

def q_and_search(sf_dir: str) -> pd.DataFrame:
    ids = _engine(sf_dir).search_and(AND_TERMS)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})

def sql_and_search() -> str:
    conds = " INTERSECT ".join(
        f"SELECT doc_id FROM toks WHERE term = '{t}'" for t in AND_TERMS
    )
    return f"WITH {sql_tokens_cte()} {conds}"

def q_or_search(sf_dir: str) -> pd.DataFrame:
    ids = _engine(sf_dir).search_or(OR_TERMS)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})

def sql_or_search() -> str:
    lst = ", ".join(f"'{t}'" for t in OR_TERMS)
    return f"""
WITH {sql_tokens_cte()}
SELECT DISTINCT doc_id FROM toks WHERE term IN ({lst})
"""

def q_phrase_search(sf_dir: str) -> pd.DataFrame:
    """Phrase adjacency on the NAIVE index (no stopword removal), so the
    oracle is a word-boundary regex on the raw text."""
    ids = _engine(sf_dir, "naive").search_phrase(PHRASE)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})

def sql_phrase_search() -> str:
    return f"""
SELECT doc_id FROM documents
WHERE regexp_matches(lower(text), '(^| ){PHRASE}( |$)')
"""

def q_delete_search(sf_dir: str, tmp_suffix: str = "del") -> pd.DataFrame:
    """D3: delete-by-keyword tombstones, then keyword search."""
    import shutil

    from ..query import SearchEngine

    src = documents_index(sf_dir, "punct")
    scratch = CACHE_ROOT / f"{src.name}-{tmp_suffix}"
    if scratch.exists():
        shutil.rmtree(scratch)
    shutil.copytree(src, scratch)
    eng = SearchEngine(scratch)
    eng.delete_by_keyword(DELETE_KW)
    ids = eng.search_keyword(SEARCH_KW)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})

def q_wordbreak(sf_dir: str) -> pd.DataFrame:
    """M6/T1: dictionary word-break of space-less text via an actor-pool
    stage holding the frequency dictionary (loaded once per actor).
    Input: each doc's first 8 non-stopword tokens concatenated without
    spaces; dictionary: corpus token frequencies.

    The Viterbi DP itself is non-SQL, but its character-preservation
    invariant IS checkable: the output carries the squashed input and
    ``rejoin_ok = (retokenized minus spaces == squashed)``. The DuckDB
    oracle recomputes ``squashed`` from the raw text and asserts
    ``rejoin_ok`` is TRUE for every doc, so a DP that drops, reorders or
    invents characters — or a stage that skips docs — hash-mismatches.
    The token choices themselves are golden-tested in pytest."""
    import pyarrow as pa
    import ray.data as rd

    from ..stages.tokenize import WordBreakStage

    stats = q_term_stats(sf_dir)  # corpus frequencies (cached index)
    word_dict = dict(zip(stats["term"], stats["total_tf"].astype(float)))

    def squash(batch: pa.Table) -> pa.Table:
        from ..analysis.stopwords import STOP_WORDS
        from ..functions.textstats import _token_lists

        toks = _token_lists(batch["text"].to_pandas())
        # dict terms come from the stopword-filtered index, so filter here too
        joined = ["".join([w for w in t if w not in STOP_WORDS][:8]) for t in toks]
        return pa.table(
            {"doc_id": batch["doc_id"].cast(pa.int64()), "text": pa.array(joined)}
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = (
        ds.map_batches(squash, batch_format="pyarrow")
        .map_batches(
            WordBreakStage,
            fn_constructor_kwargs=dict(dict_path_or_mapping=word_dict),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .to_pandas()
    )
    out["squashed"] = out["text"]  # the stage's input column, carried through
    out["rejoin_ok"] = out["tokens"].map("".join) == out["squashed"]
    return out[["doc_id", "squashed", "rejoin_ok"]].astype({"doc_id": "int64"})

def sql_wordbreak() -> str:
    return rf"""
WITH raw AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                     '[ \t\n\x0b\f\r]+')) AS t,
           generate_subscripts(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                                  '[ \t\n\x0b\f\r]+'), 1) AS pos
    FROM documents
), kept AS (
    SELECT doc_id, t, pos,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
    FROM raw
    WHERE t <> '' AND t NOT IN ({_stoplist_sql()})
)
SELECT d.doc_id,
       coalesce(string_agg(k.t, '' ORDER BY k.rn), '') AS squashed,
       TRUE AS rejoin_ok
FROM documents d
LEFT JOIN (SELECT * FROM kept WHERE rn <= 8) k USING (doc_id)
GROUP BY d.doc_id
"""

def q_fetch_topk(sf_dir: str) -> pd.DataFrame:
    """J4: doc_id → document fetch join for the BM25 top-5."""
    eng = _engine(sf_dir)
    top = eng.search_bm25(BM25_QUERY, topk=5)
    texts = eng.fetch_docs([d for d, _ in top])
    return pd.DataFrame(
        {
            "doc_id": pd.Series([d for d, _ in top], dtype="int64"),
            "score": pd.Series([round(s, 6) for _, s in top], dtype="float64"),
            "text": [texts[d] for d, _ in top],
        }
    )

def sql_fetch_topk() -> str:
    inner = sql_bm25_all().strip().rstrip()
    return f"""
WITH ranked AS ({inner})
SELECT r.doc_id, r.score, d.text
FROM ranked r JOIN documents d USING (doc_id)
ORDER BY r.score DESC, r.doc_id LIMIT 5
"""

BATCH_QUERIES = [BM25_QUERY, "fast scan", "customer join line"]

def q_batch_queries(sf_dir: str) -> pd.DataFrame:
    """§3.2 Ray-native batch query path: queries Dataset →
    actor-pool QueryEngineStage (engine state loaded once per actor)."""
    import pyarrow as pa
    import ray.data as rd

    from ..query import QueryEngineStage

    idx = documents_index(sf_dir, "punct")
    tbl = pa.table(
        {
            "qid": pa.array(list(range(len(BATCH_QUERIES))), pa.int64()),
            "query": pa.array(BATCH_QUERIES),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            QueryEngineStage,
            fn_constructor_kwargs=dict(index_dir=str(idx), kind="bm25", topk=5),
            batch_format="pyarrow",
            batch_size=2,
            concurrency=2,
        )
        .to_pandas()
    )
    out["score"] = out["score"].round(6)
    return out.astype({"qid": "int64", "rank": "int64", "doc_id": "int64"})

def sql_batch_queries() -> str:
    """UNION ALL of per-query ranked top-5 BM25 selects — one shared
    token/stat CTE chain, one scored CTE per batch query."""
    parts = [
        sql_tokens_cte(),
        "dls AS (SELECT doc_id, sum(tf) AS dl FROM toks GROUP BY doc_id)",
        "stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term)",
        "n AS (SELECT count(*) AS c FROM documents)",
        "avgdl AS (SELECT sum(dl) / CAST((SELECT c FROM n) AS DOUBLE) AS v FROM dls)",
    ]
    selects = []
    for i, q in enumerate(BATCH_QUERIES):
        qterms = ", ".join(f"('{t}')" for t in q.split())
        parts.append(f"q{i}(term) AS (VALUES {qterms})")
        parts.append(f"qtf{i} AS (SELECT term, count(*) AS qn FROM q{i} GROUP BY term)")
        parts.append(
            f"""scored{i} AS (
    SELECT toks.doc_id,
           sum(((1.2 + 1.0) * ln((CAST(n.c AS DOUBLE) - stats.df + 0.5) / (stats.df + 0.5) + 1.0))
               * (toks.tf / (toks.tf + 1.2 * (1.0 - 0.75 + 0.75 * dls.dl / avgdl.v)))
               * qtf{i}.qn) AS score
    FROM toks JOIN qtf{i} USING (term) JOIN stats USING (term) JOIN dls USING (doc_id)
    CROSS JOIN n CROSS JOIN avgdl GROUP BY toks.doc_id)"""
        )
        selects.append(
            f"SELECT * FROM (SELECT {i} AS qid, "
            f'CAST(row_number() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS "rank", '
            f"doc_id, round(score, 6) AS score FROM scored{i} "
            f"ORDER BY score DESC, doc_id LIMIT 5)"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)

NOT_INCLUDE = ["join", "window"]

NOT_EXCLUDE = ["slow", "zebra"]

PREFIX = "s"

def q_not_search(sf_dir: str) -> pd.DataFrame:
    """Boolean AND-NOT: all include terms, none of the exclude terms."""
    ids = _engine(sf_dir).search_not(NOT_INCLUDE, NOT_EXCLUDE)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})

def sql_not_search() -> str:
    conds = " INTERSECT ".join(
        f"SELECT doc_id FROM toks WHERE term = '{t}'" for t in NOT_INCLUDE
    )
    lst = ", ".join(f"'{t}'" for t in NOT_EXCLUDE)
    return f"""
WITH {sql_tokens_cte()}
SELECT * FROM ({conds})
EXCEPT SELECT doc_id FROM toks WHERE term IN ({lst})
"""

def q_term_prefix(sf_dir: str) -> pd.DataFrame:
    """Term completion (suggest): top-10 dictionary terms by df under a
    prefix — a metadata-only range scan over the term-sorted shard
    dictionaries (K5 row-group pruning), no postings decoded."""
    top = _engine(sf_dir).prefix_terms(PREFIX, 10)
    return pd.DataFrame(
        {
            "term": [t for t, _ in top],
            "df": pd.Series([d for _, d in top], dtype="int64"),
        }
    )

def sql_term_prefix() -> str:
    return f"""
WITH {sql_tokens_cte()}
SELECT term, count(*) AS df FROM toks WHERE term LIKE '{PREFIX}%'
GROUP BY term ORDER BY df DESC, term LIMIT 10
"""

SPELL_WORD = "dat"

def q_spell_correct(sf_dir: str) -> pd.DataFrame:
    """Dictionary spell suggestion: Dataset scan of the shard term
    dictionaries (block_id==0 rows, (term, df) columns only) with a
    numpy-vectorized Levenshtein kernel; ≤ max_dist candidates reach
    the driver."""
    from searchengine_ray.functions.spell import suggest_terms

    idx = documents_index(sf_dir, "punct")
    return suggest_terms(idx, SPELL_WORD, max_dist=2, k=5)

def sql_spell_correct() -> str:
    return f"""
WITH {sql_tokens_cte()},
dict AS (SELECT term, count(*) AS df FROM toks GROUP BY term)
SELECT term, df, CAST(levenshtein(term, '{SPELL_WORD}') AS BIGINT) AS dist
FROM dict WHERE levenshtein(term, '{SPELL_WORD}') <= 2
ORDER BY dist, df DESC, term LIMIT 5
"""

def q_kwic(sf_dir: str) -> pd.DataFrame:
    """Keyword-in-context snippets: ±3-token window around the first
    'dup' in every matching doc — the search-preview / term-mining
    primitive, one vectorized streaming pass."""
    import ray.data as rd

    from ..functions.kwic import kwic

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return kwic(ds, term="dup", window=3).to_pandas().astype({"doc_id": "int64"})

def sql_kwic() -> str:
    return r"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                            '[ \t\n\x0b\f\r]+') AS l
  FROM documents)
SELECT doc_id,
       array_to_string(l[greatest(1, p - 3) : least(len(l), p + 3)], ' ') AS snippet
FROM (SELECT doc_id, l, list_position(l, 'dup') AS p FROM toks)
WHERE p > 0
"""

def q_search_facets(sf_dir: str) -> pd.DataFrame:
    """Facet counts over a keyword search: match set from the INDEX
    (postings lookup), facet metadata from a pruned read of the docs
    table. The doc_id match set is broadcast once (``ray.put``); each
    batch does one ``np.isin`` membership probe, then a facet-domain-
    sized groupby — the result-drilldown sidebar of every search UI."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    ids = np.asarray(_engine(sf_dir).search_keyword(KEYWORD), dtype=np.int64)
    ref = ray.put(np.sort(ids))

    def member(batch, _r=ref):
        import pyarrow as pa

        hit = np.isin(
            batch["doc_id"].to_numpy(zero_copy_only=False), ray.get(_r),
            assume_unique=False,
        )
        return batch.filter(pa.array(hit))

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )
    out = (
        ds.map_batches(member, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )
    return out.astype({"n_docs": "int64"})

def sql_search_facets() -> str:
    return f"""
WITH {sql_tokens_cte()},
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{KEYWORD}')
SELECT d.lang, d.source, count(*) AS n_docs
FROM documents d JOIN hits USING (doc_id)
GROUP BY d.lang, d.source
"""

def q_near_search(sf_dir: str) -> pd.DataFrame:
    """Proximity (NEAR/slop) search on the NAIVE index: docs where
    'window' occurs within 3 analyzed positions of 'merge' — composite
    (doc, pos) keys + one searchsorted, positions blocks decoded once."""
    ids = _engine(sf_dir, "naive").search_near("window", "merge", slop=3)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})

def sql_near_search() -> str:
    return r"""
WITH raw AS (
  SELECT doc_id, unnest(l) AS t, unnest(range(1, len(l)+1)) AS pos
  FROM (SELECT doc_id,
               string_split_regex(lower(text), '[ \t\n\x0b\f\r]+') AS l
        FROM documents)
), tok AS (
  SELECT doc_id, t,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS p
  FROM raw WHERE t <> ''
)
SELECT DISTINCT a.doc_id
FROM tok a JOIN tok b USING (doc_id)
WHERE a.t = 'window' AND b.t = 'merge' AND abs(a.p - b.p) <= 3
"""

def q_fuzzy_search(sf_dir: str) -> pd.DataFrame:
    """Fuzzy keyword search: expand the misspelled query 'windov' to
    every dictionary term within edit distance 1 (Dataset scan of the
    shard dictionaries, vectorized Levenshtein), then OR-search the
    expansion — the did-you-mean query path composed from existing
    pieces."""
    from ..functions.spell import suggest_terms
    from ..query import SearchEngine

    idx = documents_index(sf_dir, "punct")
    cands = suggest_terms(idx, "windov", max_dist=1, k=1000)
    if not len(cands):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    ids = SearchEngine(idx).search_or(list(cands["term"]))
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})

def sql_fuzzy_search() -> str:
    return f"""
WITH {SQL_TOKENS_CTE.format(stoplist=_stoplist_sql())},
fuzzy AS (
  SELECT DISTINCT term FROM toks WHERE levenshtein(term, 'windov') <= 1
)
SELECT DISTINCT doc_id FROM toks WHERE term IN (SELECT term FROM fuzzy)
"""

SNIPPET_TERMS = ["window", "merge", "query"]

SNIPPET_W = 8

def q_snippets(sf_dir: str) -> pd.DataFrame:
    """Best-window search snippets with <em> highlighting: among windows
    anchored at query-term hits, pick the one with the most distinct
    query terms (tie → earliest). Corpus-wide for verification; serving
    runs it on top-k docs only (functions/kwic.py:snippet_batch)."""
    import ray.data as rd

    from ..functions.kwic import snippets

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        snippets(ds, SNIPPET_TERMS, window=SNIPPET_W)
        .to_pandas()
        .astype({"doc_id": "int64"})
    )

def sql_snippets() -> str:
    q = ", ".join(f"'{t}'" for t in SNIPPET_TERMS)
    w = SNIPPET_W
    return rf"""
WITH tokl AS (
  SELECT doc_id,
         string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                            '[ \t\n\x0b\f\r]+') AS l
  FROM documents),
tok AS (SELECT doc_id, unnest(l) AS t, unnest(range(1, len(l)+1)) AS pos FROM tokl),
cand AS (SELECT doc_id, pos AS p FROM tok WHERE t IN ({q})),
scored AS (
  SELECT c.doc_id, c.p, count(DISTINCT h.t) AS sc
  FROM cand c JOIN tok h
    ON h.doc_id = c.doc_id AND h.pos >= c.p AND h.pos < c.p + {w} AND h.t IN ({q})
  GROUP BY c.doc_id, c.p),
best AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p,
           row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, p) AS rn
    FROM scored) WHERE rn = 1)
SELECT b.doc_id,
       array_to_string(
         list_transform(l[b.p : least(len(l), b.p + {w - 1})],
                        x -> CASE WHEN x IN ({q}) THEN '<em>' || x || '</em>' ELSE x END),
         ' ') AS snippet
FROM best b JOIN tokl USING (doc_id)
"""

BOOL_QUERY = "window AND (merge OR zebra) AND NOT join"

def q_boolean_query(sf_dir: str) -> pd.DataFrame:
    """Boolean query language (AND/OR/NOT/parens/phrases) parsed by
    ``query/boolparse.py`` and compiled onto the engine's set
    primitives — the search-box front end over J1/J2/J3."""
    from searchengine_ray.query.boolparse import search_boolean

    ids = search_boolean(_engine(sf_dir), BOOL_QUERY)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})

def sql_boolean_query() -> str:
    return f"""
WITH {sql_tokens_cte()}
SELECT doc_id FROM (
  SELECT doc_id FROM toks WHERE term = 'window'
  INTERSECT
  (SELECT doc_id FROM toks WHERE term = 'merge'
   UNION SELECT doc_id FROM toks WHERE term = 'zebra')
)
EXCEPT SELECT doc_id FROM toks WHERE term = 'join'
"""

_GREP_PATTERN = r"(scan|merge|sort)"

def q_regex_search(sf_dir: str) -> pd.DataFrame:
    """Distributed grep: RE2 match-count over the corpus via the Arrow
    `count_substring_regex` kernel — a pure streaming scan (pruned
    columns, zero shuffle, batch-local filter). At 100 TB this is the
    canonical 'scan everything once' job; both engines use RE2
    (pyarrow and DuckDB), so non-overlapping match counts agree."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    def hits(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(b["text"], _GREP_PATTERN), pa.int64())
        t = pa.table({"doc_id": b["doc_id"], "n_matches": n})
        return t.filter(pc.greater(n, 0))

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(hits, batch_format="pyarrow").to_pandas()
    return out.astype({"doc_id": "int64", "n_matches": "int64"})

def sql_regex_search() -> str:
    return f"""
SELECT doc_id, len(regexp_extract_all(text, '{_GREP_PATTERN}')) AS n_matches
FROM documents
WHERE regexp_matches(text, '{_GREP_PATTERN}')
"""

AUTOCOMPLETE_PREFIX = "fast"

def q_autocomplete(sf_dir: str) -> pd.DataFrame:
    """Next-word suggestion (search-box autocomplete): corpus bigram
    counts conditioned on the typed word → top-5 continuations with
    conditional probability. Reuses the bigram combiner; the
    prefix filter runs on the per-batch partials, so only the typed
    word's continuations (≤ vocab per batch) enter the shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.ngrams import bigram_partial_counts

    def only_prefix(b: pa.Table) -> pa.Table:
        b = bigram_partial_counts(b)
        return b.filter(pc.equal(b["t1"], AUTOCOMPLETE_PREFIX)).select(["t2", "n_part"])

    agg = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(only_prefix, batch_format="pyarrow")
        .groupby("t2")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    total = float(agg["n"].sum())
    agg["p"] = round_half_away(agg["n"] / total)
    out = agg.sort_values(["n", "t2"], ascending=[False, True]).head(5)
    out = out.rename(columns={"t2": "next_term"}).reset_index(drop=True)
    return out[["next_term", "n", "p"]].astype({"next_term": "object", "n": "int64"})

def sql_autocomplete() -> str:
    return rf"""
WITH tok AS (
  SELECT doc_id, t, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM (SELECT doc_id, unnest(l) AS t, unnest(range(1, len(l)+1)) AS pos
        FROM (SELECT doc_id,
                     string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                        '[ \t\n\x0b\f\r]+') AS l
              FROM documents))
  WHERE t <> ''),
nxt AS (
  SELECT b.t AS next_term, count(*) AS n
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
  WHERE a.t = '{AUTOCOMPLETE_PREFIX}'
  GROUP BY 1)
SELECT next_term, n, round(n / (SELECT CAST(sum(n) AS DOUBLE) FROM nxt), 6) AS p
FROM nxt ORDER BY n DESC, next_term LIMIT 5
"""

def q_proximity_rank(sf_dir: str) -> pd.DataFrame:
    """Proximity-weighted ranking: BM25 plus a 1/(1+mindist) bonus where
    mindist is the per-doc minimum token distance between the two query
    terms (positional index, composite-key nearest-neighbor — the same
    machinery as NEAR search). Rewards docs where the terms form a
    phrase-like cluster over docs that merely contain both."""
    eng = _engine(sf_dir, "naive")
    res = eng.search_bm25(["window", "merge"], topk=None)
    base = pd.DataFrame({"doc_id": [d for d, _ in res], "bm25": [s for _, s in res]})
    ids, dist = eng.min_term_distance("window", "merge")
    prox = pd.DataFrame({"doc_id": ids, "d": dist})
    out = base.merge(prox, on="doc_id", how="left")
    bonus = np.where(np.isnan(out["d"]), 0.0, 1.0 / (1.0 + out["d"].fillna(0)))
    out["score"] = np.round(out["bm25"].to_numpy() + bonus, 6)
    out = out.sort_values(["score", "doc_id"], ascending=[False, True]).head(20)
    out = out.reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "doc_id", "score"]].astype({"rank": "int64", "doc_id": "int64"})

def sql_proximity_rank() -> str:
    return rf"""
WITH raw AS (
  SELECT doc_id, unnest(l) AS t, unnest(range(1, len(l)+1)) AS pos
  FROM (SELECT doc_id,
               string_split_regex(lower(text), '[ \t\n\x0b\f\r]+') AS l
        FROM documents)
), tok AS (
  SELECT doc_id, t,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS p
  FROM raw WHERE t <> ''
),
toks AS (SELECT doc_id, t AS term, count(*) AS tf FROM tok GROUP BY 1, 2),
dls AS (SELECT doc_id, sum(tf) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
avgdl AS (SELECT sum(dl) / CAST((SELECT c FROM n) AS DOUBLE) AS v FROM dls),
q1(term) AS (VALUES ('window'), ('merge')),
s1 AS ({_sql_bm25_scored("q1")}),
md AS (
  SELECT a.doc_id, min(abs(a.p - b.p)) AS d
  FROM tok a JOIN tok b USING (doc_id)
  WHERE a.t = 'window' AND b.t = 'merge'
  GROUP BY 1)
SELECT rank, doc_id, score FROM (
  SELECT CAST(row_number() OVER (
           ORDER BY round(s1.score + coalesce(1.0 / (1.0 + md.d), 0.0), 6) DESC, doc_id
         ) AS BIGINT) AS rank,
         doc_id,
         round(s1.score + coalesce(1.0 / (1.0 + md.d), 0.0), 6) AS score
  FROM s1 LEFT JOIN md USING (doc_id))
WHERE rank <= 20
"""

INFIX_NEEDLE = "ind"

def q_term_infix(sf_dir: str) -> pd.DataFrame:
    """Wildcard (*ind*) dictionary lookup: top-10 terms by df containing
    the needle — the honest full-dictionary metadata scan (contains
    can't range-prune a term-sorted layout), postings never load."""
    top = _engine(sf_dir).infix_terms(INFIX_NEEDLE, 10)
    return pd.DataFrame(
        {
            "term": [t for t, _ in top],
            "df": pd.Series([d for _, d in top], dtype="int64"),
        }
    )

def sql_term_infix() -> str:
    return f"""
WITH {sql_tokens_cte()}
SELECT term, count(*) AS df FROM toks WHERE term LIKE '%{INFIX_NEEDLE}%'
GROUP BY term ORDER BY df DESC, term LIMIT 10
"""

SYNONYMS: dict[str, list[str]] = {"merge": ["join", "hash"], "stream": ["batch"]}

SYNONYM_QUERY = ["merge", "stream"]

def q_synonym_search(sf_dir: str) -> pd.DataFrame:
    """Query-rewrite search: each query term expands through a broadcast
    synonym map before hitting the index; result is every doc matching
    ≥1 expanded term with its distinct-matched-term count (the
    coverage signal a reranker consumes). Per-term postings come from
    the term-pruned segment reader — one point read per expanded term,
    no corpus scan."""
    expanded = sorted({t for q in SYNONYM_QUERY for t in [q, *SYNONYMS.get(q, [])]})
    eng = _engine(sf_dir)
    counts: dict[int, int] = {}
    for term in expanded:
        for d in eng.search_keyword(term):
            counts[d] = counts.get(d, 0) + 1
    out = pd.DataFrame(
        {
            "doc_id": pd.Series(list(counts.keys()), dtype="int64"),
            "n_matched": pd.Series(list(counts.values()), dtype="int64"),
        }
    )
    return out.sort_values("doc_id").reset_index(drop=True)

def sql_synonym_search() -> str:
    expanded = sorted({t for q in SYNONYM_QUERY for t in [q, *SYNONYMS.get(q, [])]})
    terms = ", ".join(f"'{t}'" for t in expanded)
    return f"""
WITH {sql_tokens_cte()}
SELECT doc_id, CAST(count(DISTINCT term) AS BIGINT) AS n_matched
FROM toks WHERE term IN ({terms})
GROUP BY doc_id
"""

PAGE_SIZE = 10

PAGE_OFFSET = 20  # i.e. page 3

def q_search_after(sf_dir: str) -> pd.DataFrame:
    """Deep pagination contract over the BM25 ranking: page 3 (rows
    21-30) of results ordered by (rounded score DESC, doc_id ASC) — the
    deterministic keyset a search API must expose so page N is stable
    under re-execution. Scoring reuses the engine's full BM25 pass;
    the slice is on the 6dp-rounded key both engines sort by."""
    res = _engine(sf_dir).search_bm25(BM25_QUERY, topk=None)
    df = pd.DataFrame(
        {
            "doc_id": pd.Series([d for d, _ in res], dtype="int64"),
            "score": pd.Series([round(s, 6) for _, s in res], dtype="float64"),
        }
    ).sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    page = df.iloc[PAGE_OFFSET : PAGE_OFFSET + PAGE_SIZE].reset_index(drop=True)
    page.insert(0, "rank", np.arange(PAGE_OFFSET + 1, PAGE_OFFSET + 1 + len(page), dtype=np.int64))
    return page

def sql_search_after() -> str:
    base = sql_bm25_all().strip().rstrip()
    return f"""
WITH paged AS ({base})
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, score
FROM paged
ORDER BY score DESC, doc_id
LIMIT {PAGE_SIZE} OFFSET {PAGE_OFFSET}
"""

SUBSTRING_PATTERN = "merge the"

def q_substring_search(sf_dir: str) -> pd.DataFrame:
    """Substring (grep) search accelerated by a character-trigram
    index — the Google-Code-Search candidate-pruning design (public:
    R. Cox, "Regular Expression Matching with a Trigram Index"):
    docs whose text contains ALL of the pattern's trigrams are
    candidates; only candidates are re-read and verified with a real
    substring match, so the expensive scan touches a tiny slice.

    Trigram extraction is fully vectorized on the raw bytes (3-byte
    windows packed into int32 keys, per-doc dedup via one np.unique on
    packed (doc, gram) keys — no Python loop over rows or chars); the
    candidate intersection is one Count groupby over the pattern's
    grams only (the posting read is pre-pruned to the query grams, the
    persisted-index analogue of a term-filtered dictionary read)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count

    pat = SUBSTRING_PATTERN.encode()
    qa = np.frombuffer(pat, np.uint8).astype(np.int32)
    qgrams = np.unique(qa[:-2] * 65536 + qa[1:-1] * 256 + qa[2:])
    n_q = len(qgrams)

    def gram_hits(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [t.encode() for t in b["text"].to_pylist()]
        blob = np.frombuffer(b"\x00".join(texts), np.uint8).astype(np.int32)
        if len(blob) < 3:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        lens = np.asarray([len(t) for t in texts], np.int64)
        # doc index of every byte position (separators belong to the
        # preceding doc; their grams are masked below)
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens + 1)[
            : len(blob)
        ]
        keys = blob[:-2] * 65536 + blob[1:-1] * 256 + blob[2:]
        ok = (blob[:-2] != 0) & (blob[1:-1] != 0) & (blob[2:] != 0)
        ok &= np.isin(keys, qgrams)
        pairs = np.unique(doc_of[:-2][ok] * np.int64(2**24) + keys[ok])
        return pa.table(
            {"doc_id": pa.array(ids[pairs >> np.int64(24)], pa.int64())}
        )

    from ._common import bucket_group_agg

    # candidate-doc-cardinality groups → partition-bucket (DESIGN.md rule)
    cands = (
        bucket_group_agg(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
            .map_batches(gram_hits, batch_format="pyarrow"),
            "doc_id",
            {"ng": ("doc_id", "size")},
        )
        .filter(expr=f"ng == {n_q}")
        .to_pandas()
    )
    cand_set = pa.array(sorted(cands["doc_id"].astype(np.int64)), pa.int64())

    def verify(b: pa.Table) -> pa.Table:
        hit = pc.is_in(b["doc_id"], value_set=cand_set)
        sub = b.filter(hit)
        m = pc.match_substring(sub["text"], SUBSTRING_PATTERN)
        return pa.table({"doc_id": sub.filter(m)["doc_id"].cast(pa.int64())})

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(verify, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64"})

def sql_substring_search() -> str:
    return f"""
SELECT doc_id FROM documents
WHERE text LIKE '%{SUBSTRING_PATTERN}%'
ORDER BY doc_id
"""

PERMUTERM_QUERIES = ["s*", "*er", "qu*y", "m*e", "*ow"]

def q_permuterm(sf_dir: str) -> pd.DataFrame:
    """Permuterm wildcard retrieval (the tolerant-retrieval rotation
    index of IR textbooks): every vocab term t becomes the |t|+1
    rotations of t+'$', a pattern X*Y becomes the single rotated
    prefix Y+'$'+X, and matching is ONE vectorized prefix scan over
    the rotation table — no regex over the corpus. df per term comes
    from the same distinct-doc combiner as the index; rotations
    explode distributed (Arrow string kernels) so the rotation table
    never sits on the driver. Output: (query, term, df) for every
    wildcard match with |term| ≥ |X|+|Y|."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ._common import bucket_group_agg

    # vocab-cardinality groups → partition-bucket (DESIGN.md rule)
    vocab = bucket_group_agg(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_docterm_batch, batch_format="pyarrow"),
        "term",
        {"df": ("df_part", "sum")},
    )

    rot_prefix = []
    minlen = []
    for pat in PERMUTERM_QUERIES:
        x, y = pat.split("*")
        rot_prefix.append(f"{y}${x}")
        minlen.append(len(x) + len(y))

    def match(b: pa.Table) -> pa.Table:
        terms = b["term"].to_pandas().to_numpy(dtype=object)
        dfs = b["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        q_out, t_out, d_out = [], [], []
        for term, df in zip(terms, dfs):
            aug = term + "$"
            rots = {aug[i:] + aug[:i] for i in range(len(aug))}
            for qi, (rp, ml) in enumerate(zip(rot_prefix, minlen)):
                if len(term) >= ml and any(r.startswith(rp) for r in rots):
                    q_out.append(PERMUTERM_QUERIES[qi])
                    t_out.append(term)
                    d_out.append(df)
        return pa.table(
            {
                "query": pa.array(q_out, pa.string()),
                "term": pa.array(t_out, pa.string()),
                "df": pa.array(np.asarray(d_out, np.int64), pa.int64()),
            }
        )

    out = vocab.map_batches(match, batch_format="pyarrow").to_pandas()
    return (
        out.sort_values(["query", "term"])
        .reset_index(drop=True)
        .astype({"df": "int64"})
    )

def sql_permuterm() -> str:
    arms = []
    for pat in PERMUTERM_QUERIES:
        x, y = pat.split("*")
        arms.append(
            f"SELECT '{pat}' AS query, term, df FROM vocab\n"
            f"WHERE term LIKE '{x}%' AND term LIKE '%{y}' "
            f"AND length(term) >= {len(x) + len(y)}"
        )
    u = "\nUNION ALL\n".join(arms)
    return f"""
WITH {sql_tokens_cte()},
vocab AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY term)
{u}
ORDER BY query, term
"""

def _docterm_batch(b):
    """Per-batch (term, df_part) distinct-doc partials matching the
    oracle ``toks`` CTE — docs never split across batches, so summing
    partials gives exact df."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..analysis.batch import PUNCT_ONLY, _tokenize_arrow

    toks = _tokenize_arrow(b["text"], PUNCT_ONLY)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    if len(flat) == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "df_part": pa.array([], pa.int64())}
        )
    dic = pc.dictionary_encode(flat)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = np.asarray(dic.dictionary.to_pylist(), dtype=object)
    keep_u = np.array([u != "" and u not in STOP_WORDS for u in uniq], dtype=bool)
    doc_rep = np.repeat(np.arange(len(b), dtype=np.int64), counts)
    ok = keep_u[codes]
    pair = np.unique(doc_rep[ok] * np.int64(len(uniq)) + codes[ok])
    tcodes = (pair % len(uniq)).astype(np.int64)
    tuniq, tcnt = np.unique(tcodes, return_counts=True)
    return pa.table(
        {
            "term": pa.array(uniq[tuniq], pa.string()),
            "df_part": pa.array(tcnt.astype(np.int64), pa.int64()),
        }
    )
