"""searchengine_ray — a Ray-Data-native full-text index + BM25 query engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``shaheming/searchEngine`` (a single-node Java LSM inverted-index
engine), re-expressed Ray-Data-first:

- ``analysis``  — tokenizers / stopwords / Porter stemmer / word-break
  (reference: ``analysis/*.java``), pure Python + vectorized batch kernels.
- ``codec``     — delta + varbyte posting compression
  (reference: ``index/inverted/DeltaVarLenCompressor.java``).
- ``extract``   — deterministic HTML → text extraction (north_rule extra).
- ``sources``   — synthetic Common-Crawl-style corpus generator + readers.
- ``build``     — the index build pipeline: ``Dataset`` → ``map_batches``
  (analyze) → ``groupby(shard)`` shuffle → term-range posting shards with
  block-max metadata, per-partition checkpoints + lineage
  (reference: ``index/inverted/InvertedIndexManager.java`` flush/merge).
- ``query``     — keyword / AND / OR / phrase / TF-IDF / BM25(+WAND) engine
  and the brute-force oracle (reference: ``search/FullScanSearcher.java``).
- ``rank``      — PageRank (reference: ``search/IcsSearchEngine.java``).
- ``functions`` — training-data-pipeline ops: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding), ANN similarity, text stats,
  multimodal stubs.
- ``pipelines`` — the query registry driving ``__ray_entry__``.

Nothing in this package calls ``ray.init()`` — the driver owns the session.
"""

__version__ = "0.1.0"
