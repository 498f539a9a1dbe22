"""Scoring pipelines: TF-IDF, BM25 variants, QL/DFR, fusion, PageRank, eval.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS
from ._common import BM25_QUERY, EVAL_QUERIES, QE_SEED, _engine, _sql_bm25_scored, _stoplist_sql, documents_index, pa_eq, round_half_away, sql_tokens_cte  # noqa: F401


TFIDF_TERMS = ["join", "window", "query"]

def q_tfidf_all(sf_dir: str) -> pd.DataFrame:
    """A4-A6/K2: TF-IDF cosine over all matches, reference formula."""
    res = _engine(sf_dir).search_tfidf(TFIDF_TERMS, None)
    return pd.DataFrame(
        {
            "doc_id": pd.Series([d for d, _ in res], dtype="int64"),
            "score": pd.Series([round(s, 6) for _, s in res], dtype="float64"),
        }
    )

def sql_tfidf_all() -> str:
    qterms = ", ".join(f"('{t}')" for t in TFIDF_TERMS)
    return f"""
WITH {sql_tokens_cte()},
q(term) AS (VALUES {qterms}),
qtf AS (SELECT term, count(*) AS qn FROM q GROUP BY term),
stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
idf AS (
    SELECT qtf.term, qtf.qn, log10(CAST(n.c AS DOUBLE) / stats.df + 1) AS idf
    FROM qtf JOIN stats USING (term) CROSS JOIN n
),
scored AS (
    SELECT toks.doc_id,
           sum((toks.tf * idf.idf) * (idf.qn * idf.idf)) AS dot,
           sum((toks.tf * idf.idf) * (toks.tf * idf.idf)) AS len
    FROM toks JOIN idf USING (term)
    GROUP BY toks.doc_id
)
SELECT doc_id, round(dot / sqrt(len), 6) AS score FROM scored WHERE len > 0
"""

def q_bm25_all(sf_dir: str) -> pd.DataFrame:
    res = _engine(sf_dir).search_bm25(BM25_QUERY, topk=None)
    return pd.DataFrame(
        {
            "doc_id": pd.Series([d for d, _ in res], dtype="int64"),
            "score": pd.Series([round(s, 6) for _, s in res], dtype="float64"),
        }
    )

PAGERANK_ITERS = 50

def q_pagerank(sf_dir: str) -> pd.DataFrame:
    """A7: PageRank over a deterministic synthetic edge set derived from
    doc ids (Ray-Data power iteration; numpy == ray verified in pytest).
    Fixed iteration count (no early stop) so the unrolled SQL oracle
    computes the identical fixed point."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..rank import pagerank_ray
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
        # distributed path: broadcast rank vector + pre-aggregated
        # groupby(dst) per iteration (pagerank_ray == pagerank_numpy is
        # pytest-verified); below that the driver-side CSR iteration is
        # the right engineering — per-iteration Dataset overhead dominates
        scores = pagerank_ray(
            rd.from_arrow(links_table(edges)), n, num_iterations=PAGERANK_ITERS, tol=None
        )
    else:
        from ..rank import pagerank_numpy

        scores = pagerank_numpy(edges, n, num_iterations=PAGERANK_ITERS, tol=None)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "score": pd.Series(np.round(scores, 6), dtype="float64"),
        }
    )

def _pagerank_ctes() -> str:
    """CTE chain for the unrolled power iteration (PAGERANK_ITERS steps,
    no early stop) over the synthetic doc-id edge set — each step one
    join + group-by; final ranks in ``r{PAGERANK_ITERS}``."""
    head = """nn AS (SELECT count(*) AS c FROM documents),
ids AS (SELECT CAST(row_number() OVER () - 1 AS BIGINT) AS id FROM documents),
edges_raw(src, dst) AS (
    SELECT id, (id * 7 + 13) % (SELECT c FROM nn) FROM ids
    UNION ALL SELECT id, (id * 31 + 5) % (SELECT c FROM nn) FROM ids
    UNION ALL SELECT id, id % 10 FROM ids
),
edges AS MATERIALIZED (SELECT src, dst FROM edges_raw WHERE src <> dst),
outdeg AS MATERIALIZED (SELECT src, count(*) AS c FROM edges GROUP BY src),
r0 AS MATERIALIZED (SELECT id AS node, 1.0 AS rank FROM ids)"""
    steps = []
    for i in range(PAGERANK_ITERS):
        steps.append(
            f""",
r{i + 1} AS MATERIALIZED (
    SELECT i.id AS node,
           0.15 + 0.85 * coalesce(s.contrib, 0.0) AS rank
    FROM ids i LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / o.c) AS contrib
        FROM edges e JOIN outdeg o ON e.src = o.src
        JOIN r{i} r ON r.node = e.src
        GROUP BY e.dst
    ) s ON s.node = i.id)"""
        )
    return head + "".join(steps)

def sql_pagerank() -> str:
    return (
        "WITH "
        + _pagerank_ctes()
        + f"\nSELECT node AS doc_id, round(rank, 6) AS score FROM r{PAGERANK_ITERS}"
    )

def sql_combined_search() -> str:
    """TF-IDF (same chain as sql_tfidf_all) + 1.0 × PageRank (unrolled),
    combined score over all TF-IDF matches, top-20 by (-score, doc)."""
    qterms = ", ".join(f"('{t}')" for t in TFIDF_TERMS)
    return f"""
WITH {sql_tokens_cte()},
q(term) AS (VALUES {qterms}),
qtf AS (SELECT term, count(*) AS qn FROM q GROUP BY term),
stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
idf AS (
    SELECT qtf.term, qtf.qn, log10(CAST(n.c AS DOUBLE) / stats.df + 1) AS idf
    FROM qtf JOIN stats USING (term) CROSS JOIN n
),
scored AS (
    SELECT toks.doc_id,
           sum((toks.tf * idf.idf) * (idf.qn * idf.idf)) AS dot,
           sum((toks.tf * idf.idf) * (toks.tf * idf.idf)) AS len
    FROM toks JOIN idf USING (term)
    GROUP BY toks.doc_id
),
{_pagerank_ctes()}
SELECT s.doc_id, round(s.dot / sqrt(s.len) + pr.rank, 6) AS score
FROM scored s JOIN r{PAGERANK_ITERS} pr ON pr.node = s.doc_id
WHERE s.len > 0
ORDER BY s.dot / sqrt(s.len) + pr.rank DESC, s.doc_id
LIMIT 20
"""

def q_combined_search(sf_dir: str) -> pd.DataFrame:
    """K3/A7+J5: TF-IDF combined with PageRank (reference
    ``IcsSearchEngine.searchQuery``: score = tfidf + w·pagerank[doc]).
    PageRank over the same synthetic doc-id graph as q_pagerank.
    Iterative + rank formula → rows-only driver check (pytest holds the
    rank-identity oracle)."""
    import pyarrow.parquet as pq

    from ..rank import WebSearchEngine, pagerank_numpy

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
    web = WebSearchEngine(documents_index(sf_dir, "punct"))
    web.pagerank = pagerank_numpy(edges, n, num_iterations=PAGERANK_ITERS, tol=None)
    res = web.search_query(TFIDF_TERMS, 20, pagerank_weight=1.0)
    return pd.DataFrame(
        {
            "doc_id": pd.Series([d for d, _ in res], dtype="int64"),
            "score": pd.Series([round(s, 6) for _, s in res], dtype="float64"),
        }
    )

def q_bigram_counts(sf_dir: str) -> pd.DataFrame:
    """Top-30 token bigrams (collocation mining): per-batch integer-coded
    pair counts (combiner) → one vocabulary-sized groupby."""
    import ray.data as rd

    from searchengine_ray.functions.ngrams import bigram_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = bigram_counts(ds, top_k=30)
    return out.astype({"n": "int64"})

def sql_bigram_counts() -> str:
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
)
SELECT a.t AS t1, b.t AS t2, count(*) AS n
FROM ftok a JOIN ftok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
GROUP BY 1, 2 ORDER BY n DESC, t1, t2 LIMIT 30
"""

MLT_DOC = 42

def q_more_like_this(sf_dir: str) -> pd.DataFrame:
    """Term-overlap "more like this": postings lookups for the source
    doc's terms + one bincount — no text re-analysis, no corpus scan."""
    res = _engine(sf_dir).more_like_this(MLT_DOC, 10)
    return pd.DataFrame(
        {
            "doc_id": pd.Series([d for d, _ in res], dtype="int64"),
            "overlap": pd.Series([o for _, o in res], dtype="int64"),
        }
    )

def sql_more_like_this() -> str:
    return f"""
WITH {sql_tokens_cte()},
dterms AS (SELECT DISTINCT term FROM toks WHERE doc_id = {MLT_DOC})
SELECT b.doc_id, count(*) AS overlap
FROM toks b JOIN dterms d ON b.term = d.term
WHERE b.doc_id <> {MLT_DOC}
GROUP BY b.doc_id ORDER BY overlap DESC, b.doc_id LIMIT 10
"""

def q_doc_keywords(sf_dir: str) -> pd.DataFrame:
    """Per-doc top-3 TF-IDF keywords from index artifacts only:
    analyzed/ explode ⋈ (term-hash) dictionary df Dataset, score
    rounded before ranking, group_topk combiner."""
    from ..functions.keywords import doc_keywords

    idx = documents_index(sf_dir, "punct")
    out = doc_keywords(idx, k=3).to_pandas()
    return out[["doc_id", "term", "score", "rank"]].astype(
        {"doc_id": "int64", "rank": "int64"}
    )

def sql_doc_keywords() -> str:
    return f"""
WITH {sql_tokens_cte()},
df AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term,
         round(t.tf * log10(CAST(n.n AS DOUBLE) / d.df + 1.0), 6) AS score
  FROM toks t JOIN df d USING (term) CROSS JOIN n)
SELECT doc_id, term, score, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank
  FROM scored)
WHERE rank <= 3
"""

def q_collocations_pmi(sf_dir: str) -> pd.DataFrame:
    """Top-20 bigrams scored with PMI (collocation strength): count
    Datasets stay distributed; only the winners + the unigram rows they
    reference reach the driver."""
    import ray.data as rd

    from ..functions.ngrams import collocations_pmi

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return collocations_pmi(ds, top_k=20)

def sql_collocations_pmi() -> str:
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
), pairs AS (
  SELECT a.t AS t1, b.t AS t2
  FROM ftok a JOIN ftok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
), bigr AS (
  SELECT t1, t2, count(*) AS n FROM pairs GROUP BY 1, 2
), uni AS (
  SELECT t, count(*) AS n FROM ftok GROUP BY t
), tot AS (
  SELECT (SELECT count(*) FROM ftok) AS t_total,
         (SELECT count(*) FROM pairs) AS b_total
)
SELECT t1, t2, bigr.n,
       round(log2((CAST(bigr.n AS DOUBLE) / b_total)
                  / ((CAST(ua.n AS DOUBLE) / t_total) * (CAST(ub.n AS DOUBLE) / t_total))), 6) AS pmi
FROM bigr JOIN uni ua ON ua.t = bigr.t1 JOIN uni ub ON ub.t = bigr.t2 CROSS JOIN tot
ORDER BY bigr.n DESC, t1, t2 LIMIT 20
"""

RRF_K = 60

def q_rrf_hybrid(sf_dir: str) -> pd.DataFrame:
    """Hybrid search via Reciprocal Rank Fusion (Cormack et al. 2009):
    BM25 lexical ranking (from the index) ⊕ embedding-cosine ranking
    (vec_id ≡ doc_id in the synthetic tables), fused as
    Σ 1/(60 + rank) over the lists a doc appears in. Both input ranks
    order by (round(score,6) DESC, doc) so 1e-16 float noise can't flip
    ranks across engines; top-20 by fused score."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..functions.similarity import cosine_topk

    # lexical list: BM25 over the index, ranked on rounded scores
    res = _engine(sf_dir).search_bm25(BM25_QUERY, topk=None)
    bm = pd.DataFrame(
        {
            "doc_id": pd.Series([d for d, _ in res], dtype="int64"),
            "s": pd.Series([round(s, 6) for _, s in res], dtype="float64"),
        }
    ).sort_values(["s", "doc_id"], ascending=[False, True])
    bm["rank"] = np.arange(1, len(bm) + 1)

    # semantic list: exact cosine vs query vec 0, all rows, same contract
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t.filter(pa_eq(t, "vec_id", 0))["embedding"][0].as_py(), dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cos = cosine_topk(ds, qvec[None, :], k=t.num_rows)
    cs = pd.DataFrame(
        {
            "doc_id": cos["vec_id"].astype("int64"),
            "s": cos["cosine"].round(6).astype("float64"),
        }
    ).sort_values(["s", "doc_id"], ascending=[False, True])
    cs["rank"] = np.arange(1, len(cs) + 1)

    fused = pd.merge(
        bm[["doc_id", "rank"]], cs[["doc_id", "rank"]],
        on="doc_id", how="outer", suffixes=("_bm", "_cos"),
    )
    rrf = np.zeros(len(fused))
    for col in ("rank_bm", "rank_cos"):
        r = fused[col].to_numpy(np.float64)
        ok = ~np.isnan(r)
        rrf[ok] += 1.0 / (RRF_K + r[ok])
    fused["rrf"] = np.round(rrf, 6)
    out = fused.sort_values(["rrf", "doc_id"], ascending=[False, True]).head(20)
    return out[["doc_id", "rrf"]].reset_index(drop=True).astype({"doc_id": "int64"})

def sql_rrf_hybrid() -> str:
    qterms = ", ".join(f"('{t}')" for t in BM25_QUERY.split())
    return f"""
WITH {sql_tokens_cte()},
q(term) AS (VALUES {qterms}),
qtf AS (SELECT term, count(*) AS qn FROM q GROUP BY term),
dls AS (SELECT doc_id, sum(tf) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
avgdl AS (SELECT sum(dl) / CAST((SELECT c FROM n) AS DOUBLE) AS v FROM dls),
bm_scored AS (
    SELECT toks.doc_id,
           round(sum(((1.2 + 1.0) * ln((CAST(n.c AS DOUBLE) - stats.df + 0.5) / (stats.df + 0.5) + 1.0))
               * (toks.tf / (toks.tf + 1.2 * (1.0 - 0.75 + 0.75 * dls.dl / avgdl.v)))
               * qtf.qn), 6) AS s
    FROM toks
    JOIN qtf USING (term) JOIN stats USING (term) JOIN dls USING (doc_id)
    CROSS JOIN n CROSS JOIN avgdl
    GROUP BY toks.doc_id
),
bm AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r FROM bm_scored),
cos_scored AS (
    SELECT e.vec_id AS doc_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(qq.embedding AS DOUBLE[])), 6) AS s
    FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) qq
),
cs AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r FROM cos_scored),
fused AS (
    SELECT coalesce(bm.doc_id, cs.doc_id) AS doc_id,
           round(coalesce(1.0 / ({RRF_K} + bm.r), 0.0)
                 + coalesce(1.0 / ({RRF_K} + cs.r), 0.0), 6) AS rrf
    FROM bm FULL OUTER JOIN cs USING (doc_id)
)
SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
"""

def q_anchor_text(sf_dir: str) -> pd.DataFrame:
    """Anchor-text aggregation (functions/anchors.py): each document page
    is rendered with real ``<a href>`` links to its two synthetic
    out-neighbors — (id·7+13)%n and (id·31+5)%n, the PageRank edge set —
    whose anchor text is the source doc's first three tokens; the
    pipeline then PARSES the HTML back (regex link extractor), resolves
    targets, tokenizes anchors, and aggregates (target, term) counts.
    The SQL oracle derives the same edges arithmetically, so the whole
    render→extract→aggregate chain is hash-verified."""
    import html as _html_mod

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from searchengine_ray.functions.anchors import anchor_term_counts
    from searchengine_ray.functions.textstats import _token_lists

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def render(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = _token_lists(batch["text"].to_pandas())
        pages = []
        for i, tl in zip(ids, toks):
            anchor = _html_mod.escape(" ".join(tl[:3]))
            links = []
            for dst in (int(i * 7 + 13) % n, int(i * 31 + 5) % n):
                if dst != int(i):
                    links.append(f'<a href="doc://{dst}">{anchor}</a>')
            pages.append(
                f"<html><body><p>page {int(i)}</p>{''.join(links)}</body></html>".encode()
            )
        return pa.table({"html": pa.array(pages, pa.binary())})

    pages = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(render, batch_format="pyarrow")
    return anchor_term_counts(pages)

def sql_anchor_text() -> str:
    return r"""
WITH nn AS (SELECT count(*) AS c FROM documents),
atok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                        '[ \t\n\x0b\f\r]+'), x -> x <> '')[1:3] AS l
  FROM documents),
edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 13) % (SELECT c FROM nn) AS dst FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 31 + 5) % (SELECT c FROM nn) FROM documents),
pairs AS (
  SELECT e.dst, unnest(a.l) AS t
  FROM edges e JOIN atok a ON a.doc_id = e.src
  WHERE e.src <> e.dst)
SELECT dst AS doc_id, t AS term, count(*) AS n
FROM pairs GROUP BY dst, t
"""

QE_FEEDBACK_DOCS = 10

QE_EXPANSION_TERMS = 5

def q_query_expansion(sf_dir: str) -> pd.DataFrame:
    """Pseudo-relevance feedback (Rocchio-style expansion): BM25 the
    seed query → top-10 feedback docs → their term vectors come from
    index artifacts only (doc-filtered BEFORE the term join, so 10
    docs' vectors — not the corpus — enter the shuffle) → top-5
    expansion terms by summed TF-IDF → re-run BM25 with the expanded
    query → final top-20. The corpus-scale stages are all Dataset ops;
    only the q×k feedback sets touch the driver."""
    from ..functions.keywords import doc_keywords
    from ray.data.aggregate import Sum

    eng = _engine(sf_dir)
    seed_terms = list(dict.fromkeys(eng.analyze(QE_SEED)))

    def topn(res, n):
        df = pd.DataFrame(
            {"doc_id": [d for d, _ in res], "score": [round(s, 6) for _, s in res]}
        )
        return df.sort_values(["score", "doc_id"], ascending=[False, True]).head(n)

    fb = topn(eng.search_bm25(seed_terms, topk=None), QE_FEEDBACK_DOCS)
    cand = (
        doc_keywords(
            documents_index(sf_dir, "punct"),
            k=1_000_000,
            doc_ids=fb["doc_id"].tolist(),
        )
        .groupby("term")
        .aggregate(Sum("score", alias_name="w"))
        .to_pandas()
    )
    cand = cand[~cand["term"].isin(seed_terms)]
    cand["w"] = cand["w"].round(6)
    exp = (
        cand.sort_values(["w", "term"], ascending=[False, True])
        .head(QE_EXPANSION_TERMS)["term"]
        .tolist()
    )
    final = topn(eng.search_bm25(seed_terms + exp, topk=None), 20).reset_index(drop=True)
    final["rank"] = np.arange(1, len(final) + 1, dtype=np.int64)
    return final[["rank", "doc_id", "score"]].astype({"rank": "int64", "doc_id": "int64"})

def sql_query_expansion() -> str:
    seed_vals = ", ".join(f"('{t}')" for t in ["fast", "scan"])
    seed_list = ", ".join(f"'{t}'" for t in ["fast", "scan"])
    return f"""
WITH {sql_tokens_cte()},
dls AS (SELECT doc_id, sum(tf) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
avgdl AS (SELECT sum(dl) / CAST((SELECT c FROM n) AS DOUBLE) AS v FROM dls),
q1(term) AS (VALUES {seed_vals}),
s1 AS ({_sql_bm25_scored("q1")}),
top10 AS (SELECT doc_id FROM s1 ORDER BY round(score, 6) DESC, doc_id LIMIT {QE_FEEDBACK_DOCS}),
cand AS (
  SELECT t.term,
         round(sum(round(t.tf * log10(CAST(n.c AS DOUBLE) / stats.df + 1.0), 6)), 6) AS w
  FROM toks t JOIN top10 USING (doc_id) JOIN stats USING (term) CROSS JOIN n
  WHERE t.term NOT IN ({seed_list})
  GROUP BY t.term),
exp5 AS (SELECT term FROM cand ORDER BY w DESC, term LIMIT {QE_EXPANSION_TERMS}),
q2(term) AS (SELECT term FROM exp5 UNION ALL SELECT unnest([{seed_list}])),
s2 AS ({_sql_bm25_scored("q2")})
SELECT rank, doc_id, score FROM (
  SELECT CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS BIGINT) AS rank,
         doc_id, round(score, 6) AS score
  FROM s2)
WHERE rank <= 20
"""

QL_QUERY = "query window join"

QL_MU = 2000.0

def q_ql_dirichlet(sf_dir: str) -> pd.DataFrame:
    """Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty
    2001) over the real index artifacts: exact collection frequencies
    from the posting tfs, exact |C| from the manifest's total_tokens,
    smoothed zero-tf contributions dense over the candidate union
    (engine.search_ql_dirichlet)."""
    res = _engine(sf_dir).search_ql_dirichlet(QL_QUERY, mu=QL_MU, topk=None)
    return pd.DataFrame(
        {
            "doc_id": pd.Series([d for d, _ in res], dtype="int64"),
            "score": pd.Series([round(s, 6) for _, s in res], dtype="float64"),
        }
    )

def sql_ql_dirichlet() -> str:
    qterms = ", ".join(f"('{t}')" for t in QL_QUERY.split())
    return f"""
WITH {sql_tokens_cte()},
q(term) AS (VALUES {qterms}),
qtf AS (SELECT term, count(*) AS qn FROM q GROUP BY term),
cf AS (SELECT term, sum(tf) AS cf FROM toks GROUP BY term),
tot AS (SELECT sum(tf) AS c FROM toks),
dls AS (SELECT doc_id, sum(tf) AS dl FROM toks GROUP BY doc_id),
qstats AS (SELECT qtf.term, qtf.qn, cf.cf FROM qtf JOIN cf USING (term)),
cand AS (SELECT DISTINCT toks.doc_id FROM toks JOIN qstats USING (term)),
scored AS (
    SELECT cand.doc_id,
           sum(qstats.qn * ln((coalesce(t.tf, 0) + {QL_MU} * qstats.cf / tot.c)
                              / (dls.dl + {QL_MU}))) AS score
    FROM cand CROSS JOIN qstats
    LEFT JOIN toks t ON t.doc_id = cand.doc_id AND t.term = qstats.term
    JOIN dls ON dls.doc_id = cand.doc_id
    CROSS JOIN tot
    GROUP BY cand.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scored
"""

BM25F_LANG = "en"

def q_bm25_filtered(sf_dir: str) -> pd.DataFrame:
    """BM25 over the index restricted to lang='{BM25F_LANG}' documents —
    filtered search with the predicate pushed into the posting scan
    (allowed-set probe BEFORE scoring; df/avgdl stay corpus-level).
    The allowed set comes from one pruned metadata-column read; at
    cluster scale it's a broadcast bitmap."""
    import pyarrow.parquet as pq

    meta = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    import pyarrow.compute as pc

    allowed = np.sort(
        meta.filter(pc.equal(meta["lang"], BM25F_LANG))["doc_id"].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
    )
    res = _engine(sf_dir).search_bm25_filtered(BM25_QUERY, allowed, topk=None)
    return pd.DataFrame(
        {
            "doc_id": pd.Series([d for d, _ in res], dtype="int64"),
            "score": pd.Series([round(s, 6) for _, s in res], dtype="float64"),
        }
    )

def sql_bm25_filtered() -> str:
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
    JOIN documents d ON d.doc_id = toks.doc_id AND d.lang = '{BM25F_LANG}'
    CROSS JOIN n CROSS JOIN avgdl
    GROUP BY toks.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scored
"""

LOGODDS_TOPK = 5

def q_distinctive_terms(sf_dir: str) -> pd.DataFrame:
    """Per-source distinctive vocabulary by smoothed log-odds ratio
    (Monroe et al.'s informative-Dirichlet shape with +1 pseudo-counts):
    one (source, term) combiner groupby bounds the shuffle by the
    vocabulary; marginals and the rest-of-corpus contrast derive on the
    vocabulary-sized table; top-{LOGODDS_TOPK} per source by (score
    DESC, term). Integer counts → ln of integer ratios → engine-equal."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.textstats import _token_lists

    def pairs(b: pa.Table) -> pa.Table:
        src = b["source"].to_pandas()
        toks = _token_lists(b["text"].to_pandas())
        lens = [len(t) for t in toks]
        flat_src = np.repeat(src.to_numpy(object), lens)
        flat_tok = np.asarray([t for ts in toks for t in ts], object)
        g = (
            pd.DataFrame({"source": flat_src, "term": flat_tok})
            .groupby(["source", "term"], as_index=False, sort=False)
            .size()
        )
        return pa.Table.from_pandas(g.rename(columns={"size": "c"}), preserve_index=False)

    from ._common import bucket_group_agg

    # (source, term)-cardinality groups → partition-bucket (DESIGN.md rule)
    vocab = bucket_group_agg(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(pairs, batch_format="pyarrow"),
        ["source", "term"],
        {"c": ("c", "sum")},
    ).to_pandas()
    tot_s = vocab.groupby("source")["c"].sum()
    tot_all = int(vocab["c"].sum())
    term_all = vocab.groupby("term")["c"].sum()
    v = vocab.copy()
    v["ts"] = v["source"].map(tot_s).astype(np.int64)
    v["ca"] = v["term"].map(term_all).astype(np.int64)
    cs = v["c"].to_numpy(np.float64)
    ts = v["ts"].to_numpy(np.float64)
    cr = v["ca"].to_numpy(np.float64) - cs
    tr = float(tot_all) - ts
    score = np.log((cs + 1.0) / (ts - cs + 1.0)) - np.log((cr + 1.0) / (tr - cr + 1.0))
    v["score"] = np.round(score, 6)
    v = v.sort_values(["source", "score", "term"], ascending=[True, False, True])
    top = v.groupby("source", sort=False).head(LOGODDS_TOPK)
    return (
        top[["source", "term", "c", "score"]]
        .reset_index(drop=True)
        .astype({"source": "object", "term": "object", "c": "int64"})
    )

def sql_distinctive_terms() -> str:
    return rf"""
WITH tok AS (
  SELECT source, t FROM (
    SELECT source,
           unnest(string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                     '[ \t\n\x0b\f\r]+')) AS t
    FROM documents)
  WHERE t <> ''),
v AS (SELECT source, t AS term, count(*) AS c FROM tok GROUP BY 1, 2),
ts AS (SELECT source, sum(c) AS ts FROM v GROUP BY 1),
ta AS (SELECT term, sum(c) AS ca FROM v GROUP BY 1),
tot AS (SELECT sum(c) AS n FROM v),
scored AS (
  SELECT v.source, v.term, v.c,
         round(ln((v.c + 1.0) / (ts.ts - v.c + 1.0))
             - ln((ta.ca - v.c + 1.0) / (tot.n - ts.ts - (ta.ca - v.c) + 1.0)), 6) AS score
  FROM v JOIN ts USING (source) JOIN ta ON ta.term = v.term CROSS JOIN tot),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY score DESC, term) AS rn
  FROM scored)
SELECT source, term, CAST(c AS BIGINT) AS c, score
FROM ranked WHERE rn <= {LOGODDS_TOPK}
"""

def q_eval_ndcg(sf_dir: str) -> pd.DataFrame:
    """Search-quality evaluation harness: NDCG@10, MRR and P@10 of the
    engine's TF-IDF ranker for a fixed query set, with deterministic
    graded relevance rel(d, q) = number of distinct query terms present
    in d (a full match — rel = |q| — counts as "relevant" for MRR/P@10).
    Everything is index-native: the ranking comes from
    ``search_tfidf`` (scores rounded to 6dp before ranking, ties by
    doc_id — reproducible bit-for-bit by the SQL oracle) and the grades
    from per-term posting lookups. The evaluation loop is per-query
    driver work over index lookups — the query path, not a scan."""
    eng = _engine(sf_dir)
    rows = []
    for qid, terms in enumerate(EVAL_QUERIES):
        res = eng.search_tfidf(terms, None)
        docs = np.asarray([d for d, _ in res], np.int64)
        scores = np.asarray([round(s, 6) for _, s in res], np.float64)
        order = np.lexsort((docs, -scores))
        top = docs[order][:10]

        term_sets = [set(int(x) for x in eng.search_keyword(t)) for t in terms]
        cand = sorted(set().union(*term_sets))
        cand_rel = {d: sum(d in s for s in term_sets) for d in cand}

        rel_top = np.asarray([cand_rel.get(int(d), 0) for d in top], np.float64)
        ranks = np.arange(1, len(top) + 1, dtype=np.float64)
        dcg = float(((2.0**rel_top - 1.0) / np.log2(ranks + 1.0)).sum())

        ideal = np.sort(
            np.asarray([cand_rel[d] for d in cand], np.float64)
        )[::-1][:10]
        iranks = np.arange(1, len(ideal) + 1, dtype=np.float64)
        idcg = float(((2.0**ideal - 1.0) / np.log2(iranks + 1.0)).sum())

        full = len(terms)
        full_hits = np.flatnonzero(rel_top == full)
        mrr = 1.0 / (full_hits[0] + 1.0) if len(full_hits) else 0.0
        rows.append(
            {
                "qid": qid,
                "n_results": len(docs),
                "ndcg10": float(round_half_away(dcg / idcg, 6)),
                "mrr_full": float(round_half_away(mrr, 6)),
                "p10": float(round_half_away(len(full_hits) / 10.0, 6)),
            }
        )
    return pd.DataFrame(rows).astype({"qid": "int64", "n_results": "int64"})

def sql_eval_ndcg() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in enumerate(EVAL_QUERIES) for t in terms
    )
    return f"""
WITH {sql_tokens_cte()},
q(qid, term) AS (VALUES {vals}),
nq AS (SELECT qid, count(*) AS qn FROM q GROUP BY qid),
stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
idf AS (
    SELECT q.qid, q.term, log10(CAST(n.c AS DOUBLE) / stats.df + 1) AS idf
    FROM q JOIN stats USING (term) CROSS JOIN n
),
scored AS (
    SELECT idf.qid, toks.doc_id,
           sum((toks.tf * idf.idf) * (1 * idf.idf)) AS dot,
           sum((toks.tf * idf.idf) * (toks.tf * idf.idf)) AS len
    FROM toks JOIN idf USING (term)
    GROUP BY idf.qid, toks.doc_id
),
s AS (SELECT qid, doc_id, round(dot / sqrt(len), 6) AS score
      FROM scored WHERE len > 0),
rel AS (
    SELECT q.qid, toks.doc_id, count(DISTINCT q.term) AS rel
    FROM toks JOIN q USING (term) GROUP BY 1, 2
),
ranked AS (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
    FROM s
),
top AS (
    SELECT r.qid, r.rnk, rel.rel
    FROM ranked r JOIN rel USING (qid, doc_id) WHERE r.rnk <= 10
),
ideal AS (
    SELECT qid, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id) AS irnk
    FROM rel
),
idcg AS (
    SELECT qid, sum((pow(2.0, rel) - 1.0) / log2(irnk + 1.0)) AS idcg
    FROM ideal WHERE irnk <= 10 GROUP BY qid
),
met AS (
    SELECT t.qid,
           sum((pow(2.0, t.rel) - 1.0) / log2(t.rnk + 1.0)) AS dcg,
           min(CASE WHEN t.rel = nq.qn THEN t.rnk END) AS firstfull,
           count(CASE WHEN t.rel = nq.qn THEN 1 END) AS nfull
    FROM top t JOIN nq ON nq.qid = t.qid GROUP BY t.qid
),
nres AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_results FROM s GROUP BY qid)
SELECT m.qid, nres.n_results,
       round(m.dcg / i.idcg, 6) AS ndcg10,
       round(CASE WHEN m.firstfull IS NULL THEN 0.0
                  ELSE 1.0 / m.firstfull END, 6) AS mrr_full,
       round(m.nfull / 10.0, 6) AS p10
FROM met m JOIN idcg i USING (qid) JOIN nres USING (qid)
ORDER BY m.qid
"""

BM25F_W_TITLE = 2.0

BM25F_W_BODY = 1.0

BM25F_B_TITLE = 0.5

BM25F_B_BODY = 0.75

BM25F_TITLE_K = 8  # first 8 raw token positions form the title field

def _split_field_tokens(
    texts: pd.Series, stop: frozenset | set
) -> tuple[list[list[str]], list[list[str]]]:
    """Positional field split: the first BM25F_TITLE_K raw split
    positions are the title, the rest the body; empty tokens and
    stopwords are dropped after the positional cut (so both engines
    agree on the boundary regardless of filtering)."""
    from ..functions.textstats import PUNCT_RE, WS_RE

    raw = (
        texts.fillna("")
        .str.lower()
        .str.replace(PUNCT_RE, " ", regex=True)
        .str.split(WS_RE, regex=True)
    )
    titles, bodies = [], []
    for ts in raw:
        titles.append([t for t in ts[:BM25F_TITLE_K] if t and t not in stop])
        bodies.append([t for t in ts[BM25F_TITLE_K:] if t and t not in stop])
    return titles, bodies

def q_bm25f_fielded(sf_dir: str) -> pd.DataFrame:
    """BM25F (Robertson & Zaragoza 2009 §3.3, the fielded ranking every
    web engine runs): documents split into a title field (the first
    BM25F_TITLE_K raw token positions) and body; per-field tf is
    length-normalized with per-field b against per-field average
    lengths, weighted (title 2.0, body 1.0) and combined BEFORE the k1
    saturation, with idf from the combined df. Field lengths,
    per-field average lengths, df and per-(query, doc) scores are all
    distributed aggregates; ranking is on the 6-dp-rounded score with
    doc_id tiebreak so the SQL oracle reproduces the exact order."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    qset = {t for q in EVAL_QUERIES for t in q}
    tmap: dict[str, list[int]] = {}
    for qid, terms in enumerate(EVAL_QUERIES):
        for t in terms:
            tmap.setdefault(t, []).append(qid)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pandas()
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        titles, bodies = _split_field_tokens(texts, STOP_WORDS)
        rows: dict[str, list] = {
            "doc_id": [],
            "term": [],
            "tf_t": [],
            "tf_b": [],
            "dl_t": [],
            "dl_b": [],
        }
        for did, ft, fb in zip(ids, titles, bodies):
            cnt: dict[str, list[int]] = {}
            for t in ft:
                if t in qset:
                    cnt.setdefault(t, [0, 0])[0] += 1
            for t in fb:
                if t in qset:
                    cnt.setdefault(t, [0, 0])[1] += 1
            for t, (a, c) in cnt.items():
                rows["doc_id"].append(int(did))
                rows["term"].append(t)
                rows["tf_t"].append(a)
                rows["tf_b"].append(c)
                rows["dl_t"].append(len(ft))
                rows["dl_b"].append(len(fb))
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "term": pa.array(rows["term"], pa.string()),
                "tf_t": pa.array(rows["tf_t"], pa.int64()),
                "tf_b": pa.array(rows["tf_b"], pa.int64()),
                "dl_t": pa.array(rows["dl_t"], pa.int64()),
                "dl_b": pa.array(rows["dl_b"], pa.int64()),
            }
        )

    def lens_only(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pandas()
        titles, bodies = _split_field_tokens(texts, STOP_WORDS)
        return pa.table(
            {
                "lt": pa.array([sum(len(t) for t in titles)], pa.int64()),
                "lb": pa.array([sum(len(t) for t in bodies)], pa.int64()),
                "n": pa.array([len(texts)], pa.int64()),
            }
        )

    lens = ds.map_batches(lens_only, batch_format="pyarrow").to_pandas()
    N = int(lens["n"].sum())
    avg_t = int(lens["lt"].sum()) / float(N)
    avg_b = int(lens["lb"].sum()) / float(N)

    posts = ds.map_batches(explode, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Count

    dfs = posts.groupby("term").aggregate(Count()).to_pandas()
    df_map = dict(zip(dfs["term"], dfs["count()"].astype(int)))

    def score(b: pa.Table) -> pa.Table:
        terms = b["term"].to_pylist()
        tf_t = b["tf_t"].to_numpy(zero_copy_only=False).astype(np.float64)
        tf_b = b["tf_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl_t = b["dl_t"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl_b = b["dl_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = np.array([df_map[t] for t in terms], np.float64)
        idf = np.log((float(N) - df + 0.5) / (df + 0.5) + 1.0)
        bt = 1.0 - BM25F_B_TITLE + BM25F_B_TITLE * dl_t / avg_t
        bb = 1.0 - BM25F_B_BODY + BM25F_B_BODY * dl_b / avg_b
        tfw = BM25F_W_TITLE * tf_t / bt + BM25F_W_BODY * tf_b / bb
        contrib = idf * tfw / (1.2 + tfw)
        reps = [tmap[t] for t in terms]
        lens_ = np.array([len(r) for r in reps], np.int64)
        idx = np.repeat(np.arange(len(terms), dtype=np.int64), lens_)
        return pa.table(
            {
                "qid": pa.array([q for r in reps for q in r], pa.int64()),
                "doc_id": b["doc_id"].take(pa.array(idx)),
                "c": pa.array(contrib[idx]),
            }
        )

    def topk(g: pa.Table) -> pa.Table:
        g = g.sort_by([("s", "descending"), ("doc_id", "ascending")]).slice(0, 10)
        return pa.table(
            {
                "qid": g["qid"],
                "rank": pa.array(np.arange(1, g.num_rows + 1, dtype=np.int64)),
                "doc_id": g["doc_id"],
                "s": g["s"],
            }
        )

    def round_s(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index("s"),
            "s",
            pa.array(round_half_away(b["s"].to_numpy(zero_copy_only=False), 6)),
        )

    out = (
        posts.map_batches(score, batch_format="pyarrow")
        .groupby(["qid", "doc_id"])
        .aggregate(Sum("c", alias_name="s"))
        .map_batches(round_s, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
        .rename(columns={"s": "score"})
    )
    return out.astype({"qid": "int64", "rank": "int64", "doc_id": "int64"})

def sql_bm25f_fielded() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in enumerate(EVAL_QUERIES) for t in terms
    )
    return rf"""
WITH pos AS (
  SELECT doc_id, ts[i] AS t, i
  FROM (SELECT doc_id,
               string_split_regex(lower(regexp_replace(text, '[,.;?!]', ' ', 'g')),
                                  '[ \t\n\x0b\f\r]+') AS ts
        FROM documents),
       unnest(range(1, len(ts) + 1)) AS u(i)),
ttoks AS (
  SELECT doc_id, t AS term, count(*) AS tf FROM pos
  WHERE i <= {BM25F_TITLE_K} AND t <> '' AND t NOT IN ({_stoplist_sql()})
  GROUP BY doc_id, t),
btoks AS (
  SELECT doc_id, t AS term, count(*) AS tf FROM pos
  WHERE i > {BM25F_TITLE_K} AND t <> '' AND t NOT IN ({_stoplist_sql()})
  GROUP BY doc_id, t),
q(qid, term) AS (VALUES {vals}),
qt AS (SELECT DISTINCT term FROM q),
tdl AS (SELECT doc_id, sum(tf) AS dl FROM ttoks GROUP BY doc_id),
bdl AS (SELECT doc_id, sum(tf) AS dl FROM btoks GROUP BY doc_id),
n AS (SELECT count(*) AS c FROM documents),
avg_t AS (SELECT coalesce(sum(dl), 0) / CAST((SELECT c FROM n) AS DOUBLE) AS v FROM tdl),
avg_b AS (SELECT coalesce(sum(dl), 0) / CAST((SELECT c FROM n) AS DOUBLE) AS v FROM bdl),
merged AS (
  SELECT coalesce(t.doc_id, b.doc_id) AS doc_id,
         coalesce(t.term, b.term) AS term,
         coalesce(t.tf, 0) AS tf_t, coalesce(b.tf, 0) AS tf_b
  FROM (SELECT * FROM ttoks WHERE term IN (SELECT term FROM qt)) t
  FULL JOIN (SELECT * FROM btoks WHERE term IN (SELECT term FROM qt)) b
    ON t.doc_id = b.doc_id AND t.term = b.term),
stats AS (SELECT term, count(*) AS df FROM merged GROUP BY term),
scored AS (
  SELECT q.qid, m.doc_id,
         round(sum(
           ln((CAST(n.c AS DOUBLE) - stats.df + 0.5) / (stats.df + 0.5) + 1.0)
           * (({BM25F_W_TITLE} * m.tf_t / (1.0 - {BM25F_B_TITLE} + {BM25F_B_TITLE} * coalesce(tdl.dl, 0) / avg_t.v)
               + {BM25F_W_BODY} * m.tf_b / (1.0 - {BM25F_B_BODY} + {BM25F_B_BODY} * coalesce(bdl.dl, 0) / avg_b.v)))
             / (1.2 + ({BM25F_W_TITLE} * m.tf_t / (1.0 - {BM25F_B_TITLE} + {BM25F_B_TITLE} * coalesce(tdl.dl, 0) / avg_t.v)
                       + {BM25F_W_BODY} * m.tf_b / (1.0 - {BM25F_B_BODY} + {BM25F_B_BODY} * coalesce(bdl.dl, 0) / avg_b.v)))
         ), 6) AS score
  FROM merged m
  JOIN q USING (term) JOIN stats USING (term)
  LEFT JOIN tdl ON tdl.doc_id = m.doc_id
  LEFT JOIN bdl ON bdl.doc_id = m.doc_id
  CROSS JOIN n CROSS JOIN avg_t CROSS JOIN avg_b
  GROUP BY q.qid, m.doc_id),
ranked AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
  FROM scored)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score
FROM ranked WHERE rank <= 10 ORDER BY qid, rank
"""

EVAL_RECALL_KS = [1, 5, 10, 20]

def q_eval_recall(sf_dir: str) -> pd.DataFrame:
    """Recall@k / precision@k curve of the TF-IDF ranker (completes the
    eval harness next to `eval_ndcg` and `eval_map`): binary relevance
    = doc contains ALL query terms, ranking = ``search_tfidf`` with
    6dp-rounded scores and doc_id ties — one (qid, k) row per cutoff
    in {EVAL_RECALL_KS}. Query path over index lookups."""
    eng = _engine(sf_dir)
    rows = []
    for qid, terms in enumerate(EVAL_QUERIES):
        res = eng.search_tfidf(terms, None)
        docs = np.asarray([d for d, _ in res], np.int64)
        scores = np.asarray([round(s, 6) for _, s in res], np.float64)
        ranked = docs[np.lexsort((docs, -scores))]
        full = set.intersection(
            *[set(int(x) for x in eng.search_keyword(t)) for t in terms]
        )
        R = len(full)
        is_rel = np.asarray([int(d) in full for d in ranked], bool)
        cum = np.cumsum(is_rel)
        for k in EVAL_RECALL_KS:
            kk = min(k, len(ranked))
            hits = int(cum[kk - 1]) if kk else 0
            rows.append(
                (
                    qid,
                    k,
                    hits,
                    float(round_half_away(hits / R, 6)) if R else 0.0,
                    float(round_half_away(hits / k, 6)),
                )
            )
    return pd.DataFrame(
        rows, columns=["qid", "k", "rel_in_topk", "recall", "precision"]
    ).astype({"qid": "int64", "k": "int64", "rel_in_topk": "int64"})

def sql_eval_recall() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in enumerate(EVAL_QUERIES) for t in terms
    )
    ks = ", ".join(str(k) for k in EVAL_RECALL_KS)
    return f"""
WITH {sql_tokens_cte()},
q(qid, term) AS (VALUES {vals}),
nq AS (SELECT qid, count(*) AS qn FROM q GROUP BY qid),
stats AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
idf AS (
    SELECT q.qid, q.term, log10(CAST(n.c AS DOUBLE) / stats.df + 1) AS idf
    FROM q JOIN stats USING (term) CROSS JOIN n),
scored AS (
    SELECT idf.qid, toks.doc_id,
           sum((toks.tf * idf.idf) * (1 * idf.idf)) AS dot,
           sum((toks.tf * idf.idf) * (toks.tf * idf.idf)) AS len
    FROM toks JOIN idf USING (term)
    GROUP BY idf.qid, toks.doc_id),
s AS (SELECT qid, doc_id, round(dot / sqrt(len), 6) AS score
      FROM scored WHERE len > 0),
rel AS (
    SELECT q.qid, toks.doc_id, count(DISTINCT q.term) AS nt
    FROM toks JOIN q USING (term) GROUP BY 1, 2),
fullrel AS (
    SELECT rel.qid, rel.doc_id
    FROM rel JOIN nq ON nq.qid = rel.qid AND rel.nt = nq.qn),
nrel AS (SELECT qid, count(*) AS r FROM fullrel GROUP BY qid),
ranked AS (
    SELECT s.qid, s.doc_id,
           row_number() OVER (PARTITION BY s.qid ORDER BY s.score DESC, s.doc_id) AS rnk,
           CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
    FROM s LEFT JOIN fullrel f ON f.qid = s.qid AND f.doc_id = s.doc_id),
ks(k) AS (SELECT unnest([{ks}])),
hits AS (
    SELECT r.qid, ks.k, sum(r.is_rel) AS h
    FROM ranked r JOIN ks ON r.rnk <= ks.k
    GROUP BY 1, 2)
SELECT CAST(h.qid AS BIGINT) AS qid, CAST(h.k AS BIGINT) AS k,
       CAST(h.h AS BIGINT) AS rel_in_topk,
       round(h.h * 1.0 / n.r, 6) AS recall,
       round(h.h * 1.0 / h.k, 6) AS precision
FROM hits h JOIN nrel n USING (qid)
ORDER BY h.qid, h.k
"""

DFR_QUERY = "hash join scan"

DFR_C = 1.0

def q_dfr_pl2(sf_dir: str) -> pd.DataFrame:
    """Divergence-from-randomness PL2 ranking over the real index
    artifacts (Amati & van Rijsbergen 2002 — the third classic scoring
    family beside BM25 and query likelihood; engine.search_dfr_pl2).
    Collection frequency / N / avgdl all come from the postings and the
    manifest; the SQL oracle recomputes the identical formula (log2 via
    DuckDB's log2) over the token CTE."""
    res = _engine(sf_dir).search_dfr_pl2(DFR_QUERY, c=DFR_C, topk=None)
    return pd.DataFrame(
        {
            "doc_id": pd.Series([d for d, _ in res], dtype="int64"),
            "score": pd.Series([round(s, 6) for _, s in res], dtype="float64"),
        }
    )

def sql_dfr_pl2() -> str:
    qterms = ", ".join(f"('{t}')" for t in DFR_QUERY.split())
    return f"""
WITH {sql_tokens_cte()},
q(term) AS (VALUES {qterms}),
qtf AS (SELECT term, count(*) AS qn FROM q GROUP BY term),
dls AS (SELECT doc_id, sum(tf) AS dl FROM toks GROUP BY doc_id),
n AS (SELECT count(*) AS c FROM documents),
avgdl AS (SELECT sum(dl) / CAST((SELECT c FROM n) AS DOUBLE) AS v FROM dls),
cf AS (SELECT term, sum(tf) AS f FROM toks GROUP BY term),
scored AS (
    SELECT toks.doc_id,
           sum(qtf.qn
               / ((toks.tf * log2(1.0 + {DFR_C} * avgdl.v / dls.dl)) + 1.0)
               * ((toks.tf * log2(1.0 + {DFR_C} * avgdl.v / dls.dl))
                    * log2((toks.tf * log2(1.0 + {DFR_C} * avgdl.v / dls.dl))
                           / (CAST(cf.f AS DOUBLE) / n.c))
                  + (CAST(cf.f AS DOUBLE) / n.c
                     - (toks.tf * log2(1.0 + {DFR_C} * avgdl.v / dls.dl)))
                    * (1.0 / ln(2.0))
                  + 0.5 * log2(2.0 * pi()
                               * (toks.tf * log2(1.0 + {DFR_C} * avgdl.v / dls.dl)))
              )) AS score
    FROM toks
    JOIN qtf USING (term) JOIN cf USING (term) JOIN dls USING (doc_id)
    CROSS JOIN n CROSS JOIN avgdl
    GROUP BY toks.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scored
"""
