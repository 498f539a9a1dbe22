"""Posting-block codecs — the pluggable ``Compressor`` extension surface
(reference ``index/inverted/Compressor.java:5-27``, injected at
``InvertedIndexManager.createOrOpenPositional(..., compressor)``,
``InvertedIndexManager.java:203``).

Two implementations, selected by ``manifest.codec``:
- ``delta_varbyte`` (default): sorted streams delta+varbyte, plain
  streams varbyte, per-doc position chains delta-restarted
  (reference ``DeltaVarLenCompressor``),
- ``naive``: raw big-endian int32 everywhere (reference
  ``NaiveCompressor``) — exists for compression-ratio comparisons
  (``Team6IndexCompressionTest``: delta+varbyte must stay < 2/3 of it).
"""

from __future__ import annotations

import numpy as np

from .varbyte import varbyte_decode, varbyte_encode


class DeltaVarbytePostingCodec:
    name = "delta_varbyte"

    @staticmethod
    def enc_sorted(vals: np.ndarray) -> bytes:
        d = np.asarray(vals, dtype=np.int64).copy()
        d[1:] -= np.asarray(vals)[:-1]
        return varbyte_encode(d)

    @staticmethod
    def dec_sorted(buf: bytes) -> np.ndarray:
        return np.cumsum(varbyte_decode(buf))

    @staticmethod
    def enc_plain(vals: np.ndarray) -> bytes:
        return varbyte_encode(np.asarray(vals, dtype=np.int64))

    @staticmethod
    def dec_plain(buf: bytes) -> np.ndarray:
        return varbyte_decode(buf)

    @staticmethod
    def enc_grouped(vals: np.ndarray, starts_mask: np.ndarray) -> bytes:
        d = np.asarray(vals, dtype=np.int64).copy()
        if len(d):
            d[1:] -= np.asarray(vals)[:-1]
            d[starts_mask] = np.asarray(vals)[starts_mask]
        return varbyte_encode(d)

    @staticmethod
    def dec_grouped(buf: bytes, counts: np.ndarray) -> np.ndarray:
        vals = varbyte_decode(buf)
        if len(vals) == 0:
            return vals
        acc = np.cumsum(vals)
        starts = np.cumsum(counts) - counts
        base = acc[starts] - vals[starts]
        return acc - np.repeat(base, counts)


class NaivePostingCodec:
    name = "naive"

    @staticmethod
    def enc_sorted(vals: np.ndarray) -> bytes:
        # raw fixed-width (int64 BE rather than the reference's int32 so
        # 63-bit hash doc-ids round-trip; still "no compression")
        return np.asarray(vals, dtype=">i8").tobytes()

    @staticmethod
    def dec_sorted(buf: bytes) -> np.ndarray:
        return np.frombuffer(buf, dtype=">i8").astype(np.int64)

    enc_plain = enc_sorted
    dec_plain = dec_sorted

    @staticmethod
    def enc_grouped(vals: np.ndarray, starts_mask: np.ndarray) -> bytes:
        return np.asarray(vals, dtype=">i8").tobytes()

    @staticmethod
    def dec_grouped(buf: bytes, counts: np.ndarray) -> np.ndarray:
        return np.frombuffer(buf, dtype=">i8").astype(np.int64)


_CODECS = {c.name: c for c in (DeltaVarbytePostingCodec, NaivePostingCodec)}


def get_posting_codec(name: str):
    try:
        return _CODECS[name]
    except KeyError:
        raise ValueError(f"unknown posting codec {name!r}; have {sorted(_CODECS)}") from None
