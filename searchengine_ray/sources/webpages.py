"""Synthetic Common-Crawl-style web-page corpus generator.

Produces deterministic Parquet tables with the ``BASELINE.json
input_hint`` schema — ``url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string`` — as a pure function of ``(seed, n_docs)``
(FIXTURES.md §F1). No external data.

Properties engineered into the corpus:

- Zipf-sampled vocabulary (~2.4k distinct words) *including* stop words,
  punctuation ``, . ; ? !``, morphological suffixes (so the Porter stemmer
  does real work) and entity-triggering characters (``&``, ``<``, ``>``)
  so HTML escaping round-trips,
- a few heavy head terms (skew tests for the postings shuffle),
- occasional Japanese sentences (``lang="ja"`` rows, CJK word-break path),
- doc lengths Zipf-ish in [10, ~2000] tokens,
- ``html`` rendered from ``text`` by a fixed template (title / paragraphs /
  script / style / comment / entity cases) such that
  ``extract.extract_text(html) == text`` byte-identical — the per-row
  invariant the build pipeline asserts.

Generation is chunked on a fixed 1000-doc grid with a per-chunk seeded rng,
so output is reproducible for any slice regardless of parallelism; the
writer emits one Parquet file per chunk group (the resumable input-partition
unit of the build).
"""

from __future__ import annotations

import html as _html
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CHUNK = 1000
_EPOCH_US = 1_500_000_000 * 1_000_000  # fixed epoch (2017-07-14), + i seconds

_ROOTS = [
    "search", "engine", "index", "token", "stem", "word", "data", "page",
    "rank", "crawl", "web", "link", "graph", "query", "score", "term",
    "document", "list", "posting", "merge", "segment", "flush", "compress",
    "delta", "byte", "position", "phrase", "boolean", "vector", "cosine",
    "frequency", "inverse", "weight", "cat", "dog", "bird", "fish", "house",
    "pizza", "summer", "winter", "garden", "river", "mountain", "valley",
    "compute", "process", "thread", "actor", "batch", "stream", "shuffle",
    "partition", "cluster", "node", "memory", "store", "disk", "cache",
    "happy", "quick", "bright", "dark", "light", "heavy", "fast", "slow",
    "green", "blue", "red", "yellow", "purple", "orange", "silver", "gold",
]
_SUFFIXES = ["", "", "", "s", "ing", "ed", "er", "ation", "ness", "ly", "ful", "ive"]
_STOPS = [
    "the", "a", "an", "and", "or", "of", "in", "on", "to", "is", "are",
    "was", "with", "for", "this", "that", "it", "as", "at", "by",
]
_PUNCT = [",", ".", ";", "?", "!"]
_HEAD_TERMS = ["wiki", "http", "home", "click"]  # heavy-tail skew terms
_ENTITY_TOKENS = ["r&d", "a<b", "x>y", 'say"hi"']
_JA_SENTENCES = [
    "東京 の 天気 は 晴れ です",
    "私 は 検索 エンジン を 作る",
    "彼 は 京都 に 行く",
    "データ 処理 が 速い",
]


N_TAIL_WORDS = 12_000  # Zipf tail of rare synthetic words (FIXTURES.md F1)


def build_vocab() -> list[str]:
    vocab: list[str] = []
    for root in _ROOTS:
        for suf in _SUFFIXES:
            w = root + suf
            if suf == "ing" and root.endswith("e"):
                w = root[:-1] + suf
            vocab.append(w)
    vocab.extend(_ENTITY_TOKENS)
    head = sorted(set(vocab))
    # rare-word tail: realistic vocabulary size so df spans 5 orders of
    # magnitude (head terms with df≈N down to hapax legomena) — without
    # this, every term is a "head term" and selective queries don't exist
    syllables = ["ba", "co", "du", "fi", "ga", "hy", "ji", "ka", "lo", "mu",
                 "ne", "po", "qua", "ri", "su", "ta", "ve", "wo", "xy", "ze"]
    tail = []
    for k in range(N_TAIL_WORDS):
        parts = [syllables[(k // (20 ** i)) % 20] for i in range(3)]
        tail.append("".join(parts) + str(k % 7))
    return head + tail


_VOCAB = build_vocab()


def _chunk_arrays(chunk_id: int, n_in_chunk: int, seed: int) -> dict[str, list]:
    rng = np.random.default_rng((seed, chunk_id))
    vocab = _VOCAB
    nv = len(vocab)
    # Zipf ranks over the vocab, fixed permutation per seed for stability;
    # inverse-CDF sampling (searchsorted) so cost is O(dl log nv), not O(nv)
    perm = np.random.default_rng(seed).permutation(nv)
    ranks = np.arange(1, nv + 1, dtype=np.float64)
    probs = (1.0 / ranks ** 1.1)
    probs /= probs.sum()
    cum = np.cumsum(probs)

    urls, texts, langs = [], [], []
    for row in range(n_in_chunk):
        i = chunk_id * CHUNK + row
        # doc length: Zipf-ish in [10, 2000]
        dl = int(min(2000, 10 + rng.pareto(1.2) * 40))
        is_ja = rng.random() < 0.03
        if is_ja:
            sent = _JA_SENTENCES[int(rng.integers(len(_JA_SENTENCES)))]
            toks = (sent + " ").split() * (max(1, dl // 8))
            toks = toks[:dl]
            lang = "ja"
        else:
            draws = np.searchsorted(cum, rng.random(dl))
            idx = perm[np.minimum(draws, nv - 1)]
            toks = [vocab[k] for k in idx]
            # splice in stopwords, punctuation, head terms
            n_extra = max(1, dl // 6)
            stop_pos = rng.integers(0, len(toks), n_extra)
            for p in stop_pos:
                toks[int(p)] = _STOPS[int(rng.integers(len(_STOPS)))]
            punct_pos = rng.integers(0, len(toks), max(1, dl // 10))
            for p in punct_pos:
                toks[int(p)] = toks[int(p)] + _PUNCT[int(rng.integers(len(_PUNCT)))]
            if rng.random() < 0.35:
                head = _HEAD_TERMS[int(rng.integers(len(_HEAD_TERMS)))]
                for p in rng.integers(0, len(toks), max(1, dl // 12)):
                    toks[int(p)] = head
            lang = "en"
        urls.append(f"https://site{i % 97}.example/{i}.html")
        texts.append(" ".join(toks))
        langs.append(lang)
    return {"i0": chunk_id * CHUNK, "urls": urls, "texts": texts, "langs": langs}


def render_html(text: str, url: str, doc_index: int) -> bytes:
    """Fixed template; ``extract_text(render_html(t, ...)) == t`` exactly."""
    esc = _html.escape(text, quote=True)
    words = esc.split(" ")
    # split body into up to 4 paragraphs at word boundaries
    n_paras = min(4, max(1, len(words) // 40 + 1))
    per = max(1, (len(words) + n_paras - 1) // n_paras)
    paras = [" ".join(words[k : k + per]) for k in range(0, len(words), per)]
    body = "".join(f"<p class=\"c{doc_index % 7}\">{p}</p>" for p in paras if p)
    variant = doc_index % 3
    script = "<script type=\"text/javascript\">var x = 1 < 2 && true; // junk</script>"
    style = "<style>.c0 { color: #aaa; } /* junk */</style>"
    comment = f"<!-- crawler meta: url={url} variant={variant} -->"
    doc = (
        "<!DOCTYPE html><html><head><title></title>"
        + (style if variant != 1 else "")
        + comment
        + "</head><body>"
        + (script if variant != 2 else "")
        + body
        + "<!-- footer --></body></html>"
    )
    return doc.encode("utf-8")


def generate_chunk(chunk_id: int, n_in_chunk: int, seed: int = 42) -> pa.Table:
    data = _chunk_arrays(chunk_id, n_in_chunk, seed)
    i0 = data["i0"]
    htmls = [
        render_html(t, u, i0 + k) for k, (t, u) in enumerate(zip(data["texts"], data["urls"]))
    ]
    ts = pa.array(
        [_EPOCH_US + (i0 + k) * 1_000_000 for k in range(n_in_chunk)],
        type=pa.timestamp("us"),
    )
    return pa.table(
        {
            "url": pa.array(data["urls"], pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(data["texts"], pa.string()),
            "lang": pa.array(data["langs"], pa.string()),
        }
    )


def generate_corpus(
    out_dir: str | Path,
    n_docs: int,
    seed: int = 42,
    chunks_per_file: int = 10,
    overwrite: bool = False,
) -> Path:
    """Write the corpus as one Parquet file per ``chunks_per_file`` chunks.

    Idempotent: skips files that already exist (unless ``overwrite``) so a
    partially generated corpus resumes.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_chunks = (n_docs + CHUNK - 1) // CHUNK
    for f0 in range(0, n_chunks, chunks_per_file):
        path = out / f"webpages-{f0 // chunks_per_file:05d}.parquet"
        if path.exists() and not overwrite:
            continue
        tables = []
        for c in range(f0, min(f0 + chunks_per_file, n_chunks)):
            n_in = min(CHUNK, n_docs - c * CHUNK)
            tables.append(generate_chunk(c, n_in, seed))
        tmp = path.with_suffix(".tmp")
        pq.write_table(pa.concat_tables(tables), tmp)
        tmp.rename(path)
    return out
