"""Text-analysis ops for large-scale training-data pipelines: token
counting, quality scoring, language-ID heuristic, document fingerprinting.

Every op is a vectorized ``map_batches`` kernel over Arrow batches; the
simple-tokenizer variants are deliberately SQL-expressible so the driver
can verify them against DuckDB oracles (same regexes, same stopword list).

Simple tokenizer (shared with the oracle SQL):
``lower → replace [,.;?!] with space → split [ \\t\\n\\x0b\\f\\r]+ →
drop empty`` — i.e. the reference PunctuationTokenizer minus stopword
removal/stemming (those are not SQL-expressible)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..analysis.stopwords import EN_STOP_WORDS

PUNCT_RE = r"[,.;?!]"
WS_RE = r"[ \t\n\x0b\f\r]+"
JA_RE = r"[ぁ-ヿ一-鿿]"

# fixed polynomial rolling-hash parameters (Rabin-Karp style)
_RH_BASE = 1000003
_RH_MOD = (1 << 61) - 1


def _token_lists(texts: pd.Series) -> pd.Series:
    return (
        texts.fillna("")
        .str.lower()
        .str.replace(PUNCT_RE, " ", regex=True)
        .str.split(WS_RE, regex=True)
        .map(lambda ts: [t for t in ts if t])
    )


def token_stats_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """doc_id, n_tokens (all), n_stop (EN stopwords), n_distinct."""
    texts = batch[text_column].to_pandas()
    toks = _token_lists(texts)
    stop = EN_STOP_WORDS
    n_tokens = toks.map(len).to_numpy(np.int64)
    n_stop = toks.map(lambda ts: sum(1 for t in ts if t in stop)).to_numpy(np.int64)
    n_distinct = toks.map(lambda ts: len(set(ts))).to_numpy(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
        }
    )


def quality_score_batch(batch: pa.Table, text_column: str = "text", ndigits: int = 6) -> pa.Table:
    """Heuristic quality signals + a combined score, all deterministic:

    ``stop_ratio`` = EN-stopword fraction, ``punct_ratio`` = punctuation
    chars / chars, ``mean_token_len``, and
    ``quality = round(0.4*stop_ratio + 0.4*min(1, n_tokens/100)
    + 0.2*(1 - punct_ratio), ndigits)``."""
    texts = batch[text_column].to_pandas().fillna("")
    toks = _token_lists(texts)
    stop = EN_STOP_WORDS
    n_tokens = toks.map(len).to_numpy(np.float64)
    n_stop = toks.map(lambda ts: sum(1 for t in ts if t in stop)).to_numpy(np.float64)
    n_chars = texts.str.len().to_numpy(np.float64)
    n_punct = texts.str.count(PUNCT_RE).to_numpy(np.float64)
    tok_chars = toks.map(lambda ts: sum(len(t) for t in ts)).to_numpy(np.float64)
    safe_tok = np.maximum(n_tokens, 1.0)
    safe_chars = np.maximum(n_chars, 1.0)
    stop_ratio = n_stop / safe_tok
    punct_ratio = n_punct / safe_chars
    mean_token_len = tok_chars / safe_tok
    quality = (
        0.4 * stop_ratio + 0.4 * np.minimum(1.0, n_tokens / 100.0) + 0.2 * (1.0 - punct_ratio)
    )
    r = lambda a: np.round(a, ndigits)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "stop_ratio": pa.array(r(stop_ratio), pa.float64()),
            "punct_ratio": pa.array(r(punct_ratio), pa.float64()),
            "mean_token_len": pa.array(r(mean_token_len), pa.float64()),
            "quality": pa.array(r(quality), pa.float64()),
        }
    )


def lang_id_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """n-gram-free heuristic language ID: "ja" when CJK codepoints are
    present, else "en" when the EN-stopword ratio ≥ 0.05, else "other".
    (Intentionally simple + SQL-expressible; a real model slots in as the
    same actor-pool stage.)"""
    texts = batch[text_column].to_pandas().fillna("")
    has_ja = texts.str.contains(JA_RE, regex=True).to_numpy(bool)
    toks = _token_lists(texts)
    stop = EN_STOP_WORDS
    n_tokens = toks.map(len).to_numpy(np.float64)
    n_stop = toks.map(lambda ts: sum(1 for t in ts if t in stop)).to_numpy(np.float64)
    ratio = n_stop / np.maximum(n_tokens, 1.0)
    lang = np.where(has_ja, "ja", np.where(ratio >= 0.05, "en", "other"))
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "lang_pred": pa.array(lang.tolist(), pa.string()),
        }
    )


def fingerprint_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Two fingerprints per doc: ``md5`` (hex, SQL-verifiable) and a
    polynomial rolling hash over the raw bytes (engine-side only)."""
    texts = batch[text_column].to_pandas().fillna("")
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    rolls = [rolling_hash(t) for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "md5": pa.array(md5s, pa.string()),
            "rhash": pa.array(rolls, pa.int64()),
        }
    )


def rolling_hash(text: str) -> int:
    h = 0
    for b in text.encode():
        h = (h * _RH_BASE + b) % _RH_MOD
    return h


def unigram_logppl(ds, text_column: str = "text", id_column: str = "doc_id") -> pd.DataFrame:
    """Unigram log-perplexity quality signal (the fluency/outlier filter
    of LLM-data curation): fit a corpus unigram model (two streaming
    aggregates: per-batch partial term counts → one vocabulary-sized
    groupby), then score each doc as mean −ln p(token).

    The fitted vocabulary is broadcast once via ``ray.put`` for the
    scoring pass — right while the vocab is dimension-sized (webtext
    unigram vocabularies cap out in the tens of millions ≈ hundreds of
    MB); past that, explode (doc_id, term) and hash-join the prob table
    instead. Tokens outside the model (impossible here — same corpus)
    would get the floor probability 1/total."""
    import ray
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch[text_column].to_pandas())
        flat = (
            np.concatenate([t for t in toks if len(t)])
            if len(toks)
            else np.array([], object)
        )
        if not flat.size:
            return pa.table({"term": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        terms, counts = np.unique(flat, return_counts=True)
        return pa.table({"term": pa.array(terms, pa.string()), "c": pa.array(counts, pa.int64())})

    vocab = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()
    )
    total = float(vocab["n"].sum())
    neglogp = {t: -np.log(c / total) for t, c in zip(vocab["term"], vocab["n"])}
    floor = -np.log(1.0 / total)
    ref = ray.put((neglogp, floor))

    def score(batch: pa.Table, _ref=ref) -> pa.Table:
        nlp, fl = ray.get(_ref)
        toks = _token_lists(batch[text_column].to_pandas())
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.empty(len(ids), np.float64)
        for i, tl in enumerate(toks):
            out[i] = (
                float(np.mean([nlp.get(t, fl) for t in tl])) if len(tl) else 0.0
            )
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "logppl": pa.array(np.round(out, 6), pa.float64()),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_column)
        .reset_index(drop=True)
    )
