"""Multimodal columns: BMP/WAV/PNG/GIF decode pipelines over binary columns.

Split from the former pipelines/queries.py monolith (round 4)."""
from __future__ import annotations

import hashlib
import math
import os
from pathlib import Path
import numpy as np
import pandas as pd
from ..analysis.stopwords import EN_STOP_WORDS, STOP_WORDS


def q_multimodal_decode(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from ..functions.multimodal import DecodeStage, add_payload_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = (
        ds.map_batches(lambda b: add_payload_batch(b), batch_format="pyarrow")
        .map_batches(DecodeStage, batch_format="pyarrow", batch_size=256, concurrency=2)
        .to_pandas()
    )
    out = out[["doc_id", "kind", "width", "height"]]
    return out.astype({"doc_id": "int64", "width": "int64", "height": "int64"})

def sql_multimodal_decode() -> str:
    # closed form of the deterministic FAKEIMG container dims
    return """
SELECT doc_id, 'image' AS kind,
       8 + doc_id % 9 AS width, 8 + doc_id % 7 AS height
FROM documents
"""

def q_multimodal_frames(sf_dir: str) -> pd.DataFrame:
    """Video frame-sampling: FAKEVID containers → every-4th-frame rows
    via an actor-pool flat-map stage. Dims/frame grid are closed-form in
    doc_id (SQL oracle); per-frame intensity features are pytest-only."""
    import ray.data as rd

    from ..functions.multimodal import FrameSampleStage, add_payload_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = (
        ds.map_batches(lambda b: add_payload_batch(b, kind="vid"), batch_format="pyarrow")
        .map_batches(FrameSampleStage, batch_format="pyarrow", batch_size=256, concurrency=2)
        .to_pandas()
    )
    out = out[["doc_id", "frame", "width", "height"]]
    return out.astype(
        {"doc_id": "int64", "frame": "int64", "width": "int64", "height": "int64"}
    )

def sql_multimodal_frames() -> str:
    # closed form: n_frames = 4 + id%13, frames kept = 0,4,8,... < n_frames
    return """
SELECT d.doc_id,
       CAST(f.frame AS BIGINT) AS frame,
       8 + d.doc_id % 9 AS width,
       8 + d.doc_id % 7 AS height
FROM documents d
JOIN (SELECT CAST(range AS BIGINT) * 4 AS frame FROM range(4)) f
  ON f.frame < 4 + d.doc_id % 13
"""

def q_multimodal_bmp(sf_dir: str) -> pd.DataFrame:
    """REAL image decode, no image library: deterministic 24-bit BMP
    payloads (pixel (y,x) = (7x+13y+doc_id) % 256) decoded by the same
    actor-pool DecodeStage — the oracle recomputes width/height and the
    exact integer pixel sum from the closed form, so a header-parsing or
    row-stride bug fails the hash."""
    import ray.data as rd

    from ..functions.multimodal import DecodeStage, add_payload_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = (
        ds.map_batches(lambda b: add_payload_batch(b, kind="bmp"), batch_format="pyarrow")
        .map_batches(DecodeStage, batch_format="pyarrow", batch_size=256, concurrency=2)
        .to_pandas()
    )
    out = out[["doc_id", "kind", "width", "height", "sum_intensity"]]
    return out.astype(
        {"doc_id": "int64", "width": "int64", "height": "int64", "sum_intensity": "int64"}
    )

def sql_multimodal_bmp() -> str:
    # gray value is replicated across R,G,B; DecodeStage sums one channel
    return """
SELECT d.doc_id, 'image/bmp' AS kind,
       8 + d.doc_id % 9 AS width, 8 + d.doc_id % 7 AS height,
       CAST(sum((7 * x.range + 13 * y.range + d.doc_id) % 256) AS BIGINT) AS sum_intensity
FROM documents d, range(17) x, range(15) y
WHERE x.range < 8 + d.doc_id % 9 AND y.range < 8 + d.doc_id % 7
GROUP BY d.doc_id
"""

def q_multimodal_wav(sf_dir: str) -> pd.DataFrame:
    """REAL audio decode, no audio library: deterministic 16-bit PCM
    WAV payloads (alternating ±(100+id%900) square wave, 64+id%33
    samples) decoded by the actor-pool AudioFeatureStage — the oracle
    recomputes sample count, RMS (= amplitude exactly) and
    zero-crossing count (= n−1 for an alternating wave) in closed form,
    so a RIFF-chunk-walk or sample-scaling bug fails the hash."""
    import ray.data as rd

    from ..functions.multimodal import AudioFeatureStage, add_payload_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = (
        ds.map_batches(lambda b: add_payload_batch(b, kind="wav"), batch_format="pyarrow")
        .map_batches(AudioFeatureStage, batch_format="pyarrow", batch_size=256, concurrency=2)
        .to_pandas()
    )
    out = out[["doc_id", "n_samples", "sample_rate", "rms", "zero_crossings"]]
    return out.astype(
        {"doc_id": "int64", "n_samples": "int64", "sample_rate": "int64", "zero_crossings": "int64"}
    )

def sql_multimodal_wav() -> str:
    return """
SELECT doc_id,
       CAST(64 + doc_id % 33 AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       round(CAST(100 + doc_id % 900 AS DOUBLE), 6) AS rms,
       CAST(63 + doc_id % 33 AS BIGINT) AS zero_crossings
FROM documents
"""

def q_multimodal_png(sf_dir: str) -> pd.DataFrame:
    """REAL PNG decode, stdlib zlib only: deterministic grayscale PNGs
    (pixel (y,x) = (3x+11y+doc_id) % 256, filter type cycling 0-4 by
    doc id) decoded by the actor-pool DecodeStage — chunk walk, inflate,
    and all five scanline unfilters are exercised; the oracle recomputes
    width/height and the exact pixel sum from the closed form, so a
    filter-reconstruction bug fails the hash."""
    import ray.data as rd

    from ..functions.multimodal import DecodeStage, add_payload_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = (
        ds.map_batches(lambda b: add_payload_batch(b, kind="png"), batch_format="pyarrow")
        .map_batches(DecodeStage, batch_format="pyarrow", batch_size=256, concurrency=2)
        .to_pandas()
    )
    out = out[["doc_id", "kind", "width", "height", "sum_intensity"]]
    return out.astype(
        {"doc_id": "int64", "width": "int64", "height": "int64", "sum_intensity": "int64"}
    )

def sql_multimodal_png() -> str:
    return """
SELECT d.doc_id, 'image/png' AS kind,
       8 + d.doc_id % 8 AS width, 8 + d.doc_id % 5 AS height,
       CAST(sum((3 * x.range + 11 * y.range + d.doc_id) % 256) AS BIGINT) AS sum_intensity
FROM documents d, range(16) x, range(13) y
WHERE x.range < 8 + d.doc_id % 8 AND y.range < 8 + d.doc_id % 5
GROUP BY d.doc_id
"""

def q_multimodal_gif(sf_dir: str) -> pd.DataFrame:
    """REAL GIF decode — the format's variable-width LZW implemented
    from the public spec (a different compression family from PNG's
    DEFLATE), grayscale palette indices as intensities, decoded by the
    actor-pool DecodeStage. Oracle recomputes width/height and the
    exact pixel sum from the closed form; roundtrip + the canonical
    1×1 spec fixture are pytest-verified."""
    import ray.data as rd

    from ..functions.multimodal import DecodeStage, add_payload_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = (
        ds.map_batches(lambda b: add_payload_batch(b, kind="gif"), batch_format="pyarrow")
        .map_batches(DecodeStage, batch_format="pyarrow", batch_size=256, concurrency=2)
        .to_pandas()
    )
    out = out[["doc_id", "kind", "width", "height", "sum_intensity"]]
    return out.astype(
        {"doc_id": "int64", "width": "int64", "height": "int64", "sum_intensity": "int64"}
    )

def sql_multimodal_gif() -> str:
    return """
SELECT d.doc_id, 'image/gif' AS kind,
       8 + d.doc_id % 7 AS width, 8 + d.doc_id % 6 AS height,
       CAST(sum((5 * x.range + 7 * y.range + d.doc_id) % 256) AS BIGINT) AS sum_intensity
FROM documents d, range(15) x, range(14) y
WHERE x.range < 8 + d.doc_id % 7 AND y.range < 8 + d.doc_id % 6
GROUP BY d.doc_id
"""
