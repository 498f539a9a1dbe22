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
(``num_cpus=4`` vs ``num_cpus=16`` by default — ``BENCH_SCALE_PAIR``)
on the same input and reports both throughputs + scaling efficiency
(the sandbox stand-in for the north_rule's N vs 4N cluster sizes; see
BASELINE.md for the steal-aware protocol and why 4v16, not 8v32).
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

# glibc malloc tunables, inherited by raylet → workers (set before
# ray.init): keep numpy temp buffers on the heap instead of mmap/munmap
# churn — measured ~10-15 % encode speedup at 16-way concurrency
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))

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


def prestart_workers(num_cpus: int) -> None:
    """Untimed Ray-worker prestart: spin up + import the package in every
    worker process before the timed window. The headline metric is
    steady-state build throughput on a warm, long-lived cluster (the
    north_rule's multi-hour 10^12-doc job); cold worker fork + package
    import (~2-4 s, identical at every cluster size) would otherwise be
    charged against the smaller arm's shorter wall time in the scaling
    pair. The brief sleep forces the scheduler to spread the warm tasks
    across all workers instead of reusing one."""
    import ray.data as rd

    def _warm(batch):
        import time as _t

        import searchengine_ray.stages.postings  # noqa: F401
        import searchengine_ray.stages.tokenize  # noqa: F401

        _t.sleep(0.4)
        return batch

    rd.range(num_cpus, override_num_blocks=num_cpus).map_batches(
        _warm, batch_size=1
    ).materialize()


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
        # shards grow with the corpus so per-shard postings volume stays
        # ~≤8k docs: at 2M docs, 128 shards (15.6k docs/shard) tripled
        # the postings phase (52 s vs 21 s at 256); 512 ≈ 256 on build
        # but pays more per-term files at query time. 128 floor keeps
        # reduce waves packed at small corpora.
        num_shards=int(
            os.environ.get("BENCH_SHARDS", str(max(128, BENCH_DOCS // 8000)))
        ),
        block_size=128,
        # task-based analyze (library default): no actor-pool spin-up in
        # the timed window and all cores map — interleaved A/B at 16 cpus
        # measured ~9 s vs ~13.4 s actor-pool at comparable steal
        analyze_concurrency=None,
        analyze_batch_size=4096,
        store_docs=False,
        resume=False,
        # 100k: Zipf head terms (df up to ~0.93·N in the v2 corpus) are an
        # indivisible encode straggler without salting; at 250k the three
        # hottest shards still ran ~6x the median reduce task (tf-heavy
        # position payloads), capping the reduce span at 16-way — finer
        # subsets pack the reducer waves evenly at every cluster size
        salt_target_postings=int(os.environ.get("BENCH_SALT_TARGET", "100000")),
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

    # batch THROUGHPUT (qps): the actor-pool query stage answers a
    # query Dataset in parallel — the serving number a search engine is
    # sized by, next to the sequential per-query latency above. Query
    # mix: the 20 bench queries tiled with a per-copy suffix term so
    # the term caches can't collapse the workload to 20 unique lookups.
    qps = qps_steady = 0.0
    if not os.environ.get("BENCH_SKIP_QPS"):
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.query import QueryEngineStage

        # enough queries that the (fresh) actor pool's spin-up amortizes
        # — map_batches pools are per-execution, so the timed run pays
        # its own startup like any real batch job would
        n_q = int(os.environ.get("BENCH_QPS_QUERIES", "2000"))
        qs = [
            f"{BM25_QUERIES[i % len(BM25_QUERIES)]} {BM25_QUERIES[(i * 7 + 3) % len(BM25_QUERIES)].split()[0]}"
            for i in range(n_q)
        ]
        q_tbl = pa.table(
            {"qid": pa.array(range(n_q), pa.int64()), "query": pa.array(qs)}
        )
        stage_kw = dict(
            fn_constructor_kwargs=dict(index_dir=str(idx_dir), kind="bm25", topk=10),
            batch_format="pyarrow",
            batch_size=32,
            concurrency=8,
        )
        # untimed warm pass (OS page cache for the shard files)
        rd.from_arrow(q_tbl.slice(0, 64)).map_batches(
            QueryEngineStage, **stage_kw
        ).materialize()
        t_b0 = time.perf_counter()
        rd.from_arrow(q_tbl).map_batches(QueryEngineStage, **stage_kw).materialize()
        qps = n_q / (time.perf_counter() - t_b0)

        # steady-state serving throughput: a LONG-LIVED pool of warmed
        # engine actors (the production serving shape — map_batches
        # pools are per-execution, so the batch-job number above pays
        # pool spin-up + cold caches; a real search service doesn't)
        @ray.remote
        class _QueryActor:
            def __init__(self, idx: str):
                from searchengine_ray.query import SearchEngine

                self.eng = SearchEngine(idx)
                self.eng.warm_shards()

            def search_many(self, queries):
                return [self.eng.search_bm25(q, topk=10) for q in queries]

            def ready(self):
                import pyarrow as _pa

                return _pa.table({"ok": _pa.array([1])})

        k_act = 8
        actors = [_QueryActor.remote(str(idx_dir)) for _ in range(k_act)]
        ray.get([a.ready.remote() for a in actors])
        ray.get([a.search_many.remote(qs[:50]) for a in actors])  # warm terms
        chunk = 25
        t_s0 = time.perf_counter()
        ray.get(
            [
                actors[i % k_act].search_many.remote(qs[i * chunk : (i + 1) * chunk])
                for i in range(n_q // chunk)
            ]
        )
        qps_steady = n_q / (time.perf_counter() - t_s0)
        for a in actors:
            ray.kill(a)

    # routed path (multi-node production shape): shard-owner actors hold
    # the shard LRUs, term lookups scatter-gather through them. Measured
    # with its own engine instance so the local term cache doesn't mask
    # the routed reads.
    rlat: list[float] = []
    if not os.environ.get("BENCH_SKIP_ROUTED"):
        from searchengine_ray.query.service import RoutedSearchEngine, ShardedQueryService

        svc = ShardedQueryService(idx_dir, num_actors=8)
        reng = RoutedSearchEngine(idx_dir, svc)
        for q in BM25_QUERIES[:3]:
            reng.search_bm25(q, topk=10)
        for q in BM25_QUERIES:
            s = time.perf_counter()
            reng.search_bm25(q, topk=10)
            rlat.append((time.perf_counter() - s) * 1000)
        reng.close()
        svc.shutdown()
    from searchengine_ray.build.manifest import IndexManifest

    mphases = IndexManifest.load(idx_dir).phases
    phases = {
        k: round(v.get("seconds", 0), 2)
        for k, v in mphases.items()
        if isinstance(v, dict) and "seconds" in v
    }
    # per-phase noisy-neighbor attribution (manifest lineage): a run
    # crushed by a steal burst in ONE phase still yields a clean
    # measurement of the other — phase-level clean medians compose into
    # the scaling-efficiency estimate (see BASELINE.md protocol)
    phase_steal = {
        k: v["steal_busy_pct"]
        for k, v in mphases.items()
        if isinstance(v, dict) and "steal_busy_pct" in v
    }
    out = {
        "index_sec": round(index_sec, 3),
        "docs_per_sec": round(BENCH_DOCS / index_sec, 1),
        "bm25_p50_ms": round(statistics.median(lat), 2),
        "bm25_p95_ms": round(sorted(lat)[int(len(lat) * 0.95) - 1], 2),
        "query_sec": round(query_sec, 3),
        "phases": phases,
        "phase_steal": phase_steal,
    }
    if qps:
        out["bm25_qps"] = round(qps, 1)
    if qps_steady:
        out["bm25_qps_steady"] = round(qps_steady, 1)
    if rlat:
        out["bm25_routed_p50_ms"] = round(statistics.median(rlat), 2)
        out["bm25_routed_p95_ms"] = round(sorted(rlat)[int(len(rlat) * 0.95) - 1], 2)
    spills = {
        k: v["spill"]
        for k, v in mphases.items()
        if isinstance(v, dict) and v.get("spill")
    }
    if any(s.get("spill_requests") for s in spills.values()):
        out["spill"] = spills
    return out


REGISTRY_BENCH = [
    "term_stats", "bm25_all", "tfidf_all", "phrase_search", "pagerank",
    "dedup_exact", "dedup_minhash", "similarity_topk", "tpch_q1",
    "events_window", "asof_join", "multimodal_bmp",
    "sessionize", "range_join", "sliding_window",
    "bigram_counts", "event_quantiles", "embedding_centroids",
    "gopher_quality", "tpch_q3", "distinct_users", "triangle_count", "lag_delta",
    # round-3 operators
    "hits_scores", "heavy_hitters", "hll_sketch", "anchor_text", "snippets",
    "retention", "cube_events", "pivot_events", "tpch_q5", "tpch_q10",
    "anti_join", "boolean_query", "rrf_hybrid", "anomaly_days", "winsorize",
    "passage_chunks", "multimodal_png", "pq_topk", "link_prediction",
    "unigram_logppl",
    # round-3 second wave (pruned in round 4 to kept registry entries)
    "query_expansion", "snapshot_diff", "custdist",
    "term_drift", "dataset_split", "autocomplete",
    # round-4 window entries (first driver verification this round)
    "ann_topk", "bm25_filtered", "dfr_pl2", "permuterm",
    "containment_dedup", "graph_ann", "filtered_ann", "data_mixture",
    "doc_packing", "bpe_train", "multimodal_gif", "eval_ndcg",
    # round-5: the full driver window is bench-visible — the remaining
    # first-verification entries plus the re-verified r2 cohort
    "readability", "sentence_stats", "session_lengths", "event_paths",
    "tpch_q18", "k_core", "jsonl_roundtrip", "wordbreak",
    "increment_compact", "batch_queries", "broadcast_join",
    "dedup_ngram", "dedup_simhash", "delete_search",
    "distinct_segments", "doc_lengths", "embedding_neardup",
    "fetch_topk", "group_topk", "hash_join", "kmeans",
    "multimodal_decode", "multimodal_frames", "multimodal_wav",
    "not_search", "or_search", "orders_topk", "term_prefix",
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


def ann_recall(sf_dir: str) -> dict[str, float]:
    """recall@10 of each ANN index vs the exact cosine top-k baseline
    (``similarity_topk``), same query vector, same corpus — quality
    reported next to speed so a fast-but-blind index can't hide
    (round-3 verdict task 9)."""
    from searchengine_ray.pipelines.queries import (
        q_ann_topk,
        q_ivf_topk,
        q_pq_topk,
        q_similarity_topk,
    )

    exact = set(q_similarity_topk(sf_dir)["vec_id"])
    out = {}
    for name, fn in (
        ("lsh", q_ann_topk),
        ("ivf", q_ivf_topk),
        ("pq", q_pq_topk),
    ):
        got = set(fn(sf_dir)["vec_id"])
        out[f"recall_at_10_{name}"] = round(len(got & exact) / max(len(exact), 1), 3)
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

    prestart_workers(NUM_CPUS)
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
        "phases": head.get("phases", {}),
        "phase_steal": head.get("phase_steal", {}),
    }
    for extra in ("bm25_qps", "bm25_qps_steady", "bm25_routed_p50_ms", "bm25_routed_p95_ms", "spill"):
        if extra in head:
            result[extra] = head[extra]
    if not os.environ.get("BENCH_SKIP_REGISTRY"):
        result["ann_recall"] = ann_recall(SF_DIR)
    ray.shutdown()
    print(json.dumps(result))


def _stat_ticks() -> tuple[int, int]:
    """(steal, busy) jiffies from /proc/stat. Steal is normalized by
    BUSY time (user+nice+system+steal), not total: with only N of 32
    vCPUs active, idle cores accrue no steal, so steal/total wildly
    understates how much of the *working* cores' time was stolen."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    busy = vals[0] + vals[1] + vals[2] + steal
    return steal, busy


def scaling() -> None:
    """Noise-robust scaling protocol (north_rule N vs 4N stand-in):
    interleaved A/B/A/B runs at the two CPU levels in fresh processes,
    median-of-REPS per arm, per-phase medians, per-run CPU-steal share.
    Efficiency is reported from the medians AND from the per-arm minima
    (the steal-free estimate) — this microVM shows 2-3x run-to-run
    variance from neighbor steal (see BASELINE.md)."""
    # default N vs 4N = 4 vs 16: on this microVM a 32-vCPU arm competes
    # directly with the noisy neighbor (23-34 % steal on most runs, see
    # BASELINE.md), so 8v32 measures the neighbor; 4v16 leaves headroom
    pair = os.environ.get("BENCH_SCALE_PAIR", "4,16")
    lo_n, hi_n = (int(x) for x in pair.split(","))
    max_tries = int(os.environ.get("BENCH_SCALE_TRIES", "5"))
    want_clean = int(os.environ.get("BENCH_CLEAN_RUNS", "2"))
    max_steal = float(os.environ.get("BENCH_MAX_STEAL", "3.0"))

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_SKIP_REGISTRY="1",
            # corpus big enough that parallel work dominates the ~5 s of
            # fixed per-run overhead (actor spin-up, phase boundaries)
            BENCH_DOCS=os.environ.get("BENCH_DOCS", "400000"),
        )
        s0, b0 = _stat_ticks()
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        s1, b1 = _stat_ticks()
        r = json.loads(out.strip().splitlines()[-1])
        r["steal_busy_pct"] = round(100.0 * (s1 - s0) / max(b1 - b0, 1), 2)
        return r

    # adaptive interleaved sampling: alternate arms; an arm stops
    # sampling once it holds `want_clean` runs whose busy-time steal is
    # under the gate (noisy-neighbor rejection), or after max_tries
    runs: dict[int, list[dict]] = {lo_n: [], hi_n: []}

    def clean(n: int) -> list[dict]:
        return [r for r in runs[n] if r["steal_busy_pct"] <= max_steal]

    for _ in range(max_tries):
        for n in (lo_n, hi_n):
            if len(clean(n)) < want_clean and len(runs[n]) < max_tries:
                runs[n].append(run(n))
        if len(clean(lo_n)) >= want_clean and len(clean(hi_n)) >= want_clean:
            break

    def arm(n: int) -> dict:
        sel = clean(n) or runs[n]  # fall back to all runs if none clean
        ts = [r["queries"]["index_build"] for r in sel]
        phases = {}
        for ph in sel[0].get("phases", {}):
            phases[ph] = round(statistics.median(r["phases"][ph] for r in sel), 2)
        t = statistics.median(ts)
        return {
            "runs_sec_all": [r["queries"]["index_build"] for r in runs[n]],
            "steal_busy_pct_all": [r["steal_busy_pct"] for r in runs[n]],
            "clean_runs_sec": ts if clean(n) else [],
            "used_sec": round(t, 2),
            "min_sec": round(min(r["queries"]["index_build"] for r in runs[n]), 2),
            "docs_per_sec": round(sel[0]["bench_docs"] / t, 1),
            "phase_medians": phases,
        }

    lo, hi = arm(lo_n), arm(hi_n)
    factor = hi_n / lo_n
    eff = (lo["used_sec"] / hi["used_sec"]) / factor
    eff_min = (lo["min_sec"] / hi["min_sec"]) / factor

    # secondary estimator: steal-corrected wall per run (wall × (1 - s)
    # approximates the quiet-host time for a CPU-bound run), then the
    # best corrected time per arm — transparent, reported alongside
    def corr_best(n: int) -> float:
        return min(
            r["queries"]["index_build"] * (1.0 - r["steal_busy_pct"] / 100.0)
            for r in runs[n]
        )

    eff_corr = (corr_best(lo_n) / corr_best(hi_n)) / factor

    # phase-composed estimator: steal bursts hit one phase of one run at
    # a time, so the per-phase MIN across runs is the best quiet-host
    # proxy each arm has; the build is the two phases run back-to-back,
    # so their min-sum composes a per-arm build floor (same logic as
    # tools/scaling_report.py over the hunter log).
    def phase_floor(n: int) -> float:
        phases = runs[n][0].get("phases", {})
        return sum(
            min(r["phases"][ph] for r in runs[n] if ph in r.get("phases", {}))
            for ph in phases
        )

    eff_phase = 0.0
    if all(r.get("phases") for rs in runs.values() for r in rs):
        flo, fhi = phase_floor(lo_n), phase_floor(hi_n)
        if fhi > 0:
            eff_phase = (flo / fhi) / factor

    estimator = (
        "median_of_steal_clean_runs"
        if clean(lo_n) and clean(hi_n)
        else "median_all_runs_no_clean_window"
    )
    print(
        json.dumps(
            {
                "metric": f"scaling_efficiency_{lo_n}_to_{hi_n}_cpus",
                "docs": runs[lo_n][0]["bench_docs"],
                "estimator": estimator,
                "steal_gate_pct": max_steal,
                "low": lo,
                "high": hi,
                "scaling_efficiency": round(eff, 3),
                "scaling_efficiency_min": round(eff_min, 3),
                "scaling_efficiency_steal_corrected": round(eff_corr, 3),
                "scaling_efficiency_phase_min": round(eff_phase, 3),
            }
        )
    )


def incremental() -> None:
    """End-to-end incremental-index lifecycle at bench scale (the 100-TB
    operational story): build a base index, attach three delta
    generations (``build_increment``), tombstone deletes, compact — and
    assert BM25 rank/score identity against a from-scratch build of the
    same corpus at every checkpoint. Prints ONE JSON line with per-stage
    seconds + identity booleans.

    ``BENCH_INC_BASE`` (default 1,000,000) / ``BENCH_INC_STEP`` (default
    100,000) size the base and each of the 3 increments; both must be
    multiples of the 5,000-doc corpus file size.
    """
    import shutil

    import ray

    from searchengine_ray.build import build_index
    from searchengine_ray.build.merge import build_increment, compact
    from searchengine_ray.query import SearchEngine
    from searchengine_ray.sources import generate_corpus

    base = int(os.environ.get("BENCH_INC_BASE", "1000000"))
    step = int(os.environ.get("BENCH_INC_STEP", "100000"))
    n_inc = 3
    per_file = 5000  # CHUNK(1000) × chunks_per_file(5)
    assert base % per_file == 0 and step % per_file == 0
    total = base + n_inc * step

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    prestart_workers(NUM_CPUS)

    corpus = Path(f"/tmp/searchengine_bench/webpages-v2-{total}")
    generate_corpus(corpus, total, chunks_per_file=5)
    files = sorted(str(p) for p in corpus.glob("webpages-*.parquet"))
    assert len(files) == total // per_file
    base_files = files[: base // per_file]
    delta_files = [
        files[(base + k * step) // per_file : (base + (k + 1) * step) // per_file]
        for k in range(n_inc)
    ]

    root = Path("/tmp/searchengine_bench/incremental")
    if root.exists():
        shutil.rmtree(root)
    idx_inc, idx_scratch = root / "inc", root / "scratch"
    num_shards = max(128, total // 8000)
    kw = dict(
        html_column="html", doc_id_mode="url_index", num_shards=num_shards,
        block_size=128, analyze_concurrency=None, analyze_batch_size=4096,
        store_docs=False, salt_target_postings=100_000,
    )

    stages: dict[str, float] = {}
    t0 = time.perf_counter()
    build_index(base_files, idx_inc, resume=False, **kw)
    stages["base_build"] = round(time.perf_counter() - t0, 2)

    for k in range(n_inc):
        t0 = time.perf_counter()
        build_increment(delta_files[k], idx_inc, root / f"delta-{k}", **kw)
        stages[f"increment_{k}"] = round(time.perf_counter() - t0, 2)

    # from-scratch twin over the full corpus (same params)
    t0 = time.perf_counter()
    build_index(files, idx_scratch, resume=False, **kw)
    stages["scratch_build"] = round(time.perf_counter() - t0, 2)

    def top10(idx: Path) -> list:
        eng = SearchEngine(idx)
        out = [eng.search_bm25(q, topk=10) for q in BM25_QUERIES]
        eng.close()
        return out

    def identical(a: list, b: list) -> bool:
        return all(
            len(ra) == len(rb)
            and all(da == db and abs(sa - sb) < 1e-9 for (da, sa), (db, sb) in zip(ra, rb))
            for ra, rb in zip(a, b)
        )

    scratch_res = top10(idx_scratch)
    identity_after_increments = identical(top10(idx_inc), scratch_res)

    # deletes: tombstone two keyword cohorts on BOTH indexes (same docs
    # by construction), re-check identity on the multi-generation index
    t0 = time.perf_counter()
    n_del = 0
    for idx in (idx_inc, idx_scratch):
        eng = SearchEngine(idx)
        for kw_del in ("pizza", "glacier"):
            n_del += eng.delete_by_keyword(kw_del)
        eng.close()
    stages["deletes"] = round(time.perf_counter() - t0, 2)
    scratch_res = top10(idx_scratch)
    identity_after_deletes = identical(top10(idx_inc), scratch_res)

    # compact physically removes tombstoned docs and recomputes N/avgdl/df,
    # so its rank-identity oracle is a from-scratch build over the LIVE
    # docs only (the scratch index still counts tombstoned docs in its
    # global stats — asserted semantics, tests/test_merge.py)
    from searchengine_ray.build.manifest import IndexManifest

    tombs = set(IndexManifest.load(idx_inc).tombstones)
    t0 = time.perf_counter()
    compact(idx_inc)
    stages["compact"] = round(time.perf_counter() - t0, 2)

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    from searchengine_ray.stages.tokenize import doc_ids_from_urls

    live_dir = root / "corpus-live"
    live_dir.mkdir(parents=True)
    for f in files:
        tbl = pq_.read_table(f)
        ids = doc_ids_from_urls(tbl["url"].to_pylist(), "url_index")
        mask = pc.invert(pc.is_in(pa.array(ids.astype("int64")), value_set=pa.array(sorted(tombs), pa.int64())))
        pq_.write_table(tbl.filter(mask), live_dir / Path(f).name)
    t0 = time.perf_counter()
    idx_live = root / "scratch-live"
    build_index(
        sorted(str(p) for p in live_dir.glob("*.parquet")), idx_live, resume=False, **kw
    )
    stages["scratch_live_build"] = round(time.perf_counter() - t0, 2)
    identity_after_compact = identical(top10(idx_inc), top10(idx_live))

    result = {
        "metric": "incremental_lifecycle",
        "value": round(sum(stages.values()), 2),
        "unit": "sec",
        "num_cpus": NUM_CPUS,
        "base_docs": base,
        "increment_docs": step,
        "deleted_docs": n_del // 2,
        "stages": stages,
        "incremental_total_sec": round(
            stages["base_build"]
            + sum(stages[f"increment_{k}"] for k in range(n_inc))
            + stages["compact"],
            2,
        ),
        "scratch_build_sec": stages["scratch_build"],
        "identity_after_increments": identity_after_increments,
        "identity_after_deletes": identity_after_deletes,
        "identity_after_compact": identity_after_compact,
    }
    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--incremental" in sys.argv:
        incremental()
    else:
        main()
