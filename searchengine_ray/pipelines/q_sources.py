"""Source/format round-trips: legacy props, WARC, JSONL.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS
from ._common import CACHE_ROOT  # noqa: F401


def q_source_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Source-format breadth: parquet → JSONL → CSV → aggregate, all via
    Ray Data's native readers/writers (S1 beyond the reference's text
    format). The aggregate proves row fidelity through both hops."""
    import shutil

    import ray.data as rd

    base = CACHE_ROOT / f"roundtrip-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    jdir, cdir = base / "jsonl", base / "csv"
    for d in (jdir, cdir):
        if d.exists():
            shutil.rmtree(d)
        d.mkdir(parents=True)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    docs.write_json(str(jdir))
    rd.read_json(str(jdir)).write_csv(str(cdir))
    from ray.data.aggregate import Count, Sum

    out = (
        rd.read_csv(str(cdir))
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="chars"))
        .to_pandas()
    )
    return out.astype({"n_docs": "int64", "chars": "int64"})

def sql_source_roundtrip() -> str:
    return """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY lang
"""

def q_warc_roundtrip(sf_dir: str) -> pd.DataFrame:
    """WET (Common Crawl WARC conversion records) source/sink fidelity:
    documents → one .warc.wet shard per block (written inside
    map_batches) → read_binary_files + byte-exact Content-Length parse
    → per-doc md5. Matching the oracle's md5(text) proves byte
    fidelity through the container format."""
    import shutil

    import pyarrow as pa

    from searchengine_ray.sources.warc import read_wet_dir, write_wet_dir

    base = CACHE_ROOT / f"wet-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    if base.exists():
        shutil.rmtree(base)
    base.mkdir(parents=True)
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    write_wet_dir(docs, str(base))

    def digest(b: pa.Table) -> pa.Table:
        import hashlib as _h

        md5 = [_h.md5(t.encode("utf-8")).hexdigest() for t in b["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "md5": pa.array(md5, pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in b["text"].to_pylist()], pa.int64()
                ),
            }
        )

    out = read_wet_dir(str(base)).map_batches(digest, batch_format="pyarrow")
    return out.to_pandas()

def sql_warc_roundtrip() -> str:
    return "SELECT doc_id, md5(text) AS md5, CAST(length(text) AS BIGINT) AS n_chars FROM documents"

def q_props_extract(sf_dir: str) -> pd.DataFrame:
    """Semi-structured field extraction: pull the integer ``k`` out of
    the JSON ``props`` column with Arrow's RE2 extract kernel (no
    per-row JSON parse in the hot path), then aggregate per
    event_type — the log-analytics staple."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": b["event_type"], "k": k})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "props"])
    out = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
        .to_pandas()
    )
    return out.astype({"n": "int64", "sum_k": "int64"})

def sql_props_extract() -> str:
    return r"""
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""

def q_jsonl_roundtrip(sf_dir: str) -> pd.DataFrame:
    """JSONL (the training-data interchange format): documents →
    sharded .jsonl via write_json → read back via read_json → per-doc
    md5. Matching the oracle's md5(text) proves byte identity through
    the serialize/parse cycle (same contract as the WET roundtrip)."""
    import hashlib as _h
    import shutil

    import pyarrow as pa
    import ray.data as rd

    base = CACHE_ROOT / f"jsonl-{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    if base.exists():
        shutil.rmtree(base)
    base.mkdir(parents=True)
    rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).write_json(
        str(base)
    )

    def digest(b: pa.Table) -> pa.Table:
        md5 = [_h.md5(t.encode("utf-8")).hexdigest() for t in b["text"].to_pylist()]
        return pa.table(
            {"doc_id": b["doc_id"].cast(pa.int64()), "md5": pa.array(md5, pa.string())}
        )

    out = rd.read_json(str(base)).map_batches(digest, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def sql_jsonl_roundtrip() -> str:
    return "SELECT doc_id, md5(text) AS md5 FROM documents"
