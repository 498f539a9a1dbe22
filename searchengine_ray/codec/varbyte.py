"""Delta + variable-byte integer codec for posting lists.

Wire format matches the reference byte-for-byte (reference
``index/inverted/DeltaVarLenCompressor.java:14-63``; golden vectors in
``index/positional/Team3CompressorTest.java:25-107``):

- delta encoding first: ``v[i] - v[i-1]`` with ``v[-1] = 0``; input must be
  sorted ascending (non-negative deltas) or ``ValueError("array is not
  sorted")`` is raised,
- each delta is emitted big-end-first in 7-bit groups; all bytes except the
  last carry the ``0x80`` continuation bit, the last byte has it clear.
  E.g. ``[128, 384, 896, 1920, 3968] → 81 00 82 00 84 00 88 00 90 00``.

``NaiveCodec`` stores values as raw big-endian int32 (reference
``index/inverted/NaiveCompressor.java``) — used for compression-ratio
comparisons.

Both encode and decode are numpy-vectorized (no Python loop over values):
encode computes per-value byte widths and scatters 7-bit groups by offset
arithmetic; decode finds group boundaries from the continuation bits and
reduces each group with positional weights via ``np.add.reduceat``.
"""

from __future__ import annotations

import numpy as np

_NOT_SORTED_MSG = "array is not sorted"

# byte width per value: number of 7-bit groups needed (value 0 → 1 byte);
# supports values up to 2^63-1 (9 groups)
_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 9)], dtype=np.int64)


def delta_encode(values: np.ndarray) -> np.ndarray:
    v = np.asarray(values, dtype=np.int64)
    if len(v) == 0:
        return v
    d = np.diff(v, prepend=np.int64(0))
    if (d < 0).any():
        raise ValueError(_NOT_SORTED_MSG)
    return d


def varbyte_encode_with_widths(deltas: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized varbyte encode; also returns per-value byte widths so a
    caller can slice the stream at value boundaries (block splitting)."""
    # keep the input dtype (int32/uint64 pass through without a widening
    # copy — memory bandwidth, not CPU, bounds the encode at scale)
    d = np.asarray(deltas)
    if d.dtype == np.uint64:
        d = d.view(np.int64)  # values < 2^63 by construction; zero-copy
    elif not np.issubdtype(d.dtype, np.integer):
        d = d.astype(np.int64)
    n = len(d)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    if (d < 0).any():
        raise ValueError("varbyte requires non-negative values")
    widths = np.searchsorted(_THRESHOLDS, d, side="right") + 1
    ends = np.cumsum(widths)
    total = int(ends[-1])
    out = np.empty(total, dtype=np.uint8)
    # for group g (0 = least significant), byte position = end-1-g
    for g in range(int(widths.max())):
        if g == 0:
            # every value has a least-significant group: skip the
            # boolean-gather temps (the all-true mask copy dominates)
            out[ends - 1] = (d & 0x7F).astype(np.uint8)
            continue
        mask = widths > g
        vals = (d[mask] >> (7 * g)) & 0x7F
        vals |= 0x80  # continuation bit on all but the last (LSB) group
        out[ends[mask] - 1 - g] = vals.astype(np.uint8)
    return out.tobytes(), widths


def varbyte_encode(deltas: np.ndarray) -> bytes:
    """Vectorized varbyte encode of non-negative int64 values."""
    return varbyte_encode_with_widths(deltas)[0]


def varbyte_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Vectorized varbyte decode → int64 array of the encoded values."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.int64)
    is_last = (b & 0x80) == 0
    starts = np.empty(len(b), dtype=bool)
    starts[0] = True
    starts[1:] = is_last[:-1]
    start_idx = np.flatnonzero(starts)
    group_lens = np.diff(np.append(start_idx, len(b)))
    # positional weight of each byte: 7 * (bytes remaining after it in group)
    within = np.arange(len(b)) - np.repeat(start_idx, group_lens)
    exp = np.repeat(group_lens, group_lens) - 1 - within
    contrib = (b & 0x7F).astype(np.int64) << (7 * exp)
    vals = np.add.reduceat(contrib, start_idx)
    if count is not None:
        vals = vals[:count]
    return vals


def encode(values: np.ndarray) -> bytes:
    """Delta + varbyte encode of a sorted ascending int array."""
    return varbyte_encode(delta_encode(values))


def decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Inverse of :func:`encode`."""
    return np.cumsum(varbyte_decode(buf, count))


def encode_nodelta(values: np.ndarray) -> bytes:
    """Varbyte without delta (for unsorted small ints, e.g. term freqs)."""
    return varbyte_encode(np.asarray(values, dtype=np.int64))


def decode_nodelta(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    return varbyte_decode(buf, count)


class DeltaVarLenCodec:
    """Reference-compatible object API (``Compressor`` extension surface,
    reference ``index/inverted/Compressor.java:5-27``)."""

    name = "delta_varbyte"

    def encode(self, values) -> bytes:
        return encode(np.asarray(list(values) if not isinstance(values, np.ndarray) else values))

    def decode(self, buf: bytes, start: int = 0, length: int | None = None) -> list[int]:
        if length is None:
            length = len(buf) - start
        window = np.frombuffer(buf, dtype=np.uint8)[start : start + length]
        if length == 0 or start >= len(buf):
            return []
        # reference decode treats the window as starting a fresh delta chain
        return np.cumsum(varbyte_decode(window)).tolist()


class NaiveCodec:
    """Raw big-endian int32 per value (reference ``NaiveCompressor.java``)."""

    name = "naive"

    def encode(self, values) -> bytes:
        return np.asarray(list(values), dtype=">i4").tobytes()

    def decode(self, buf: bytes, start: int = 0, length: int | None = None) -> list[int]:
        if length is None:
            length = len(buf) - start
        return np.frombuffer(buf, dtype=">i4", offset=start, count=length // 4).tolist()
