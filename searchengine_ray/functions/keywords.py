"""Per-document keyword extraction from the inverted index.

``doc_keywords``: the top-k TF-IDF terms of every document — the
doc-tagging / auto-labelling primitive. Everything comes from index
artifacts, never a text re-scan:

- per-doc term vectors from ``analyzed/`` (columns pruned to
  doc_id/terms/tfs), exploded to posting rows with vectorized
  offsets/repeat — one streaming pass;
- global df from the term-sorted shard dictionaries (``block_id == 0``
  rows, (term, df) columns; summed across generations and salted
  subsets) — a vocabulary-sized Dataset;
- the two meet in Ray Data's native hash join on ``term`` (vocab side
  is NOT broadcast — at web scale the vocabulary outgrows a worker
  heap, so the join shuffles both sides by term hash);
- score = tf · log10(N/df + 1) (the engine's A4 IDF), rounded BEFORE
  ranking so the (score DESC, term) order is reproducible bit-for-bit
  by a SQL oracle;
- per-doc top-k via the ``group_topk`` partial-top-k combiner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def doc_keywords(index_dir, k: int = 3, ndigits: int = 6, doc_ids=None):
    """(doc_id, term, score, rank) Dataset — the ``k`` highest-TF-IDF
    terms per document, rank 1-based within doc.

    ``doc_ids``: optional iterable restricting the computation to those
    documents — the filter runs batch-local BEFORE the explode, so only
    the selected docs' term vectors enter the term join (the
    relevance-feedback shape: k docs out of a 10^12-doc corpus)."""
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..build.manifest import IndexManifest

    manifest = IndexManifest.load(index_dir)
    n_docs = int(manifest.n_docs)

    files = []
    for gen in manifest.generations:
        files.extend(sorted(str(p) for p in (index_dir / gen).glob("shard=*.parquet")))
    dict_ds = (
        rd.read_parquet(files, columns=["term", "df"], filter=pads.field("block_id") == 0)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df_g"))
    )

    id_set = (
        pa.array(sorted({int(d) for d in doc_ids}), pa.int64())
        if doc_ids is not None
        else None
    )

    def explode(b: pa.Table) -> pa.Table:
        if id_set is not None:
            import pyarrow.compute as pc

            b = b.filter(pc.is_in(b["doc_id"], value_set=id_set))
        terms_col = b["terms"].combine_chunks()
        runs = terms_col.value_lengths().to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(
            b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), runs
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_rep, pa.int64()),
                "term": terms_col.flatten(),
                "tf": b["tfs"].combine_chunks().flatten(),
            }
        )

    exploded = rd.read_parquet(
        str(index_dir / "analyzed"), columns=["doc_id", "terms", "tfs"]
    ).map_batches(explode, batch_format="pyarrow")

    joined = exploded.join(
        dict_ds, join_type="inner", num_partitions=8, on=("term",)
    )

    def score(b: pa.Table) -> pa.Table:
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = b["df_g"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.round(tf * np.log10(n_docs / df + 1.0), ndigits)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "term": b["term"],
                "score": pa.array(s, pa.float64()),
            }
        )

    from .sampling import group_topk

    return group_topk(
        joined.map_batches(score, batch_format="pyarrow"),
        group_col="doc_id",
        order_col="score",
        tie_col="term",
        k=k,
    )
