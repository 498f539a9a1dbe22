"""Benchmark harness.

Headline: build the full positional BM25 index (html-extract → analyze
actor pool → postings shuffle with block-max shards) over a deterministic
synthetic Common-Crawl-style corpus (input_hint schema), then measure BM25
query latency. Also times representative registry pipelines over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Prints ONE JSON line:
``{"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "bm25_p50_ms": ...}``

``--scaling``: runs the same headline in two fresh processes
(``num_cpus=8`` vs ``num_cpus=32``) on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the
north_rule's N vs 4N cluster sizes; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "120000"))
# v2: realistic Zipf vocabulary (12k-word tail) — new dir so stale
# small-vocab corpora are never reused
CORPUS_DIR = Path(f"/tmp/searchengine_bench/webpages-v2-{BENCH_DOCS}")

BM25_QUERIES = [
    "search engine index", "pagerank links graph", "pizza summer house",
    "token stem stopword", "shuffle partition cluster", "bright green garden",
    "query scores ranked", "wiki", "compressed posting lists",
    "fast slow heavy light", "mountain river valley", "actor batch stream",
    "data processing engine", "winter garden house", "crawl web pages",
    "memory store disk cache", "document frequency inverse", "click home",
    "delta byte positions", "boolean vector cosine",
]


def build_corpus() -> Path:
    from searchengine_ray.sources import generate_corpus

    t0 = time.perf_counter()
    generate_corpus(CORPUS_DIR, BENCH_DOCS, chunks_per_file=5)
    gen_sec = time.perf_counter() - t0
    if gen_sec > 1:
        print(f"# corpus generated in {gen_sec:.1f}s", file=sys.stderr)
    return CORPUS_DIR


def run_headline(num_cpus: int) -> dict:
    import shutil

    import ray

    from searchengine_ray.build import build_index
    from searchengine_ray.query import SearchEngine

    corpus = build_corpus()
    # warm page cache (untimed)
    for f in corpus.glob("*.parquet"):
        f.read_bytes()

    idx_dir = Path(f"/tmp/searchengine_bench/idx-{num_cpus}")
    if idx_dir.exists():
        shutil.rmtree(idx_dir)

    t0 = time.perf_counter()
    build_index(
        str(corpus),
        idx_dir,
        html_column="html",
        doc_id_mode="url_index",
        num_shards=64,
        block_size=128,
        analyze_concurrency=max(1, num_cpus - 2),
        analyze_batch_size=4096,
        store_docs=False,
        resume=False,
        salt_target_postings=int(os.environ.get("BENCH_SALT_TARGET", "1000000")),
    )
    index_sec = time.perf_counter() - t0
    ray.shutdown() if False else None

    eng = SearchEngine(idx_dir)
    # warm the term cache with one pass, then measure latencies
    for q in BM25_QUERIES[:3]:
        eng.search_bm25(q, topk=10)
    lat = []
    t_q0 = time.perf_counter()
    for q in BM25_QUERIES:
        s = time.perf_counter()
        eng.search_bm25(q, topk=10)
        lat.append((time.perf_counter() - s) * 1000)
    query_sec = time.perf_counter() - t_q0
    return {
        "index_sec": round(index_sec, 3),
        "docs_per_sec": round(BENCH_DOCS / index_sec, 1),
        "bm25_p50_ms": round(statistics.median(lat), 2),
        "bm25_p95_ms": round(sorted(lat)[int(len(lat) * 0.95) - 1], 2),
        "query_sec": round(query_sec, 3),
    }


REGISTRY_BENCH = [
    "term_stats", "bm25_all", "tfidf_all", "phrase_search", "pagerank",
    "dedup_exact", "dedup_minhash", "similarity_topk", "tpch_q1",
    "events_window",
]


def run_registry(sf_dir: str) -> dict[str, float]:
    from searchengine_ray.pipelines.queries import registry

    reg = registry()
    out = {}
    for name in REGISTRY_BENCH:
        fn, _ = reg[name]
        t0 = time.perf_counter()
        fn(sf_dir)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    head = run_headline(NUM_CPUS)
    queries = {} if os.environ.get("BENCH_SKIP_REGISTRY") else run_registry(SF_DIR)
    queries["index_build"] = head["index_sec"]
    queries["bm25_queries"] = head["query_sec"]

    result = {
        "metric": "index_build_plus_bm25_queries",
        "value": round(head["index_sec"] + head["query_sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_docs": BENCH_DOCS,
        "docs_per_sec": head["docs_per_sec"],
        "bm25_p50_ms": head["bm25_p50_ms"],
        "bm25_p95_ms": head["bm25_p95_ms"],
    }
    ray.shutdown()
    print(json.dumps(result))


def scaling() -> None:
    """Same headline at num_cpus=8 and 32 in fresh processes."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_SKIP_REGISTRY="1",
            # corpus big enough that parallel work dominates the ~5 s of
            # fixed per-run overhead (actor spin-up, phase boundaries)
            BENCH_DOCS=os.environ.get("BENCH_DOCS", "400000"),
        )
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # two runs per level, best-of — this microVM shows heavy CPU-steal
    # noise (2-3x run-to-run variance); min is the steal-free estimate
    lo = min((run(8) for _ in range(2)), key=lambda r: r["queries"]["index_build"])
    hi = min((run(32) for _ in range(2)), key=lambda r: r["queries"]["index_build"])
    t_lo, t_hi = lo["queries"]["index_build"], hi["queries"]["index_build"]
    eff = (t_lo / t_hi) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32_cpus",
                "docs": lo["bench_docs"],
                "index_sec_8": t_lo,
                "index_sec_32": t_hi,
                "docs_per_sec_8": lo["docs_per_sec"],
                "docs_per_sec_32": hi["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
