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

from .varbyte import varbyte_decode, varbyte_encode, varbyte_encode_with_widths


def _native_int(vals: np.ndarray) -> np.ndarray:
    """No-copy signed view of the input (uint64 → int64 view; values are
    < 2^63 by construction); widening copies only for non-integer input."""
    v = np.asarray(vals)
    if v.dtype == np.uint64:
        return v.view(np.int64)
    if not np.issubdtype(v.dtype, np.integer):
        return v.astype(np.int64)
    return v


def _slice_stream(stream: bytes, widths: np.ndarray, bounds: np.ndarray) -> list[bytes]:
    """Split an encoded stream at value-index ``bounds`` (len = n_blocks+1)
    using per-value byte widths."""
    byte_ends = np.concatenate(([0], np.cumsum(widths)))
    return [
        stream[int(byte_ends[bounds[i]]) : int(byte_ends[bounds[i + 1]])]
        for i in range(len(bounds) - 1)
    ]


class DeltaVarbytePostingCodec:
    name = "delta_varbyte"

    @staticmethod
    def enc_sorted(vals: np.ndarray) -> bytes:
        v = _native_int(vals)
        d = v.copy()
        d[1:] -= v[:-1]
        return varbyte_encode(d)

    @staticmethod
    def dec_sorted(buf: bytes) -> np.ndarray:
        return np.cumsum(varbyte_decode(buf))

    @staticmethod
    def enc_plain(vals: np.ndarray) -> bytes:
        return varbyte_encode(_native_int(vals))

    @staticmethod
    def dec_plain(buf: bytes) -> np.ndarray:
        return varbyte_decode(buf)

    @staticmethod
    def enc_grouped(vals: np.ndarray, starts_mask: np.ndarray) -> bytes:
        v = _native_int(vals)
        d = v.copy()
        if len(d):
            d[1:] -= v[:-1]
            d[starts_mask] = v[starts_mask]
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

    # --- per-term batched encode, sliced at block boundaries (one numpy
    # pass per term instead of one per 128-doc block → head-term skew path)

    @staticmethod
    def enc_sorted_blocks(vals: np.ndarray, bounds: np.ndarray) -> list[bytes]:
        v = _native_int(vals)
        d = v.copy()
        if len(d):
            d[1:] -= v[:-1]
            d[bounds[:-1]] = v[bounds[:-1]]  # fresh delta chain per block
        stream, widths = varbyte_encode_with_widths(d)
        return _slice_stream(stream, widths, bounds)

    @staticmethod
    def enc_plain_blocks(vals: np.ndarray, bounds: np.ndarray) -> list[bytes]:
        stream, widths = varbyte_encode_with_widths(_native_int(vals))
        return _slice_stream(stream, widths, bounds)

    @staticmethod
    def enc_grouped_blocks(
        vals: np.ndarray, starts_mask: np.ndarray, bounds: np.ndarray
    ) -> list[bytes]:
        v = _native_int(vals)
        d = v.copy()
        if len(d):
            d[1:] -= v[:-1]
            d[starts_mask] = v[starts_mask]
        stream, widths = varbyte_encode_with_widths(d)
        return _slice_stream(stream, widths, bounds)

    # --- batched multi-block decode (ONE varbyte pass over concatenated
    # block payloads; block encodings restart the delta chain per block,
    # so dec_grouped re-anchors exactly — query-side mirror of the
    # enc_*_blocks encoders above)

    @staticmethod
    def dec_sorted_many(bufs: list[bytes], counts: np.ndarray) -> np.ndarray:
        return DeltaVarbytePostingCodec.dec_grouped(b"".join(bufs), counts)

    @staticmethod
    def dec_plain_many(bufs: list[bytes], counts: np.ndarray) -> np.ndarray:
        return varbyte_decode(b"".join(bufs))


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

    @staticmethod
    def _fixed_blocks(vals: np.ndarray, bounds: np.ndarray) -> list[bytes]:
        stream = np.asarray(vals, dtype=">i8").tobytes()
        return [stream[int(bounds[i]) * 8 : int(bounds[i + 1]) * 8] for i in range(len(bounds) - 1)]

    @classmethod
    def enc_sorted_blocks(cls, vals, bounds):
        return cls._fixed_blocks(vals, bounds)

    @classmethod
    def enc_plain_blocks(cls, vals, bounds):
        return cls._fixed_blocks(vals, bounds)

    @classmethod
    def enc_grouped_blocks(cls, vals, starts_mask, bounds):
        return cls._fixed_blocks(vals, bounds)

    @staticmethod
    def dec_sorted_many(bufs: list[bytes], counts: np.ndarray) -> np.ndarray:
        return np.frombuffer(b"".join(bufs), dtype=">i8").astype(np.int64)

    dec_plain_many = dec_sorted_many


_CODECS = {c.name: c for c in (DeltaVarbytePostingCodec, NaivePostingCodec)}


def get_posting_codec(name: str):
    try:
        return _CODECS[name]
    except KeyError:
        raise ValueError(f"unknown posting codec {name!r}; have {sorted(_CODECS)}") from None
