"""Elias-Fano quasi-succinct encoding for sorted posting lists.

The modern successor to gap+varbyte for inverted indexes (Vigna,
"Quasi-succinct indices", WSDM 2013; the layout Lucene and PISA use for
doc-id lists). For a strictly-increasing sequence ``x_0 < … < x_{n-1}``
drawn from a universe ``U`` (all ``x_i < U``):

- ``l = max(0, floor(log2(U / n)))`` low bits of every value are stored
  verbatim in a packed little-endian bit stream (``n*l`` bits),
- the high parts ``x_i >> l`` are stored in negated-unary form: bit
  ``i + (x_i >> l)`` of the upper stream is set, giving exactly
  ``n + (x_{n-1} >> l) + 1`` bits.

Wire layout here: the lower stream (byte-aligned) followed by the upper
stream (byte-aligned); the decoder recovers the split point from
``(n, universe)`` alone, so lists need no per-list header. Total size is
``ceil(n*l / 8) + ceil((n + (x_last >> l) + 1) / 8)`` bytes — at most
``2 + ceil(log2(U/n))`` bits per element, within half a bit of the
information-theoretic minimum.

Both directions are numpy-vectorized: encode scatters bits with
``np.packbits`` over fancy-indexed bit planes; decode recovers the high
parts as ``flatnonzero(upper_bits) - arange(n)`` and the low parts with a
power-of-two dot product. No Python loop over values.
"""

from __future__ import annotations

import numpy as np

_NOT_SORTED_MSG = "ids must be strictly increasing"


def low_bits(n: int, universe: int) -> int:
    """The Elias-Fano low-bit width: max(0, floor(log2(universe / n)))."""
    if n <= 0:
        raise ValueError("n must be positive")
    if universe < n:
        raise ValueError("universe smaller than the sequence length")
    q = universe // n
    return q.bit_length() - 1 if q >= 1 else 0


def encoded_size(n: int, last_id: int, universe: int) -> int:
    """Exact encoded byte count without materializing the encoding."""
    l = low_bits(n, universe)
    upper_bits = n + (last_id >> l) + 1
    return (n * l + 7) // 8 + (upper_bits + 7) // 8


def encode(ids: np.ndarray, universe: int) -> bytes:
    x = np.asarray(ids, dtype=np.int64)
    n = len(x)
    if n == 0:
        return b""
    if (np.diff(x) <= 0).any() or x[0] < 0:
        raise ValueError(_NOT_SORTED_MSG)
    if int(x[-1]) >= universe:
        raise ValueError("id outside universe")
    l = low_bits(n, universe)
    parts = []
    if l > 0:
        # bit j of value i lands at stream offset i*l + j (little-endian)
        planes = ((x[:, None] >> np.arange(l)[None, :]) & 1).astype(np.uint8)
        parts.append(np.packbits(planes.ravel(), bitorder="little").tobytes())
    else:
        parts.append(b"")
    high = x >> l
    upper = np.zeros(n + int(high[-1]) + 1, dtype=np.uint8)
    upper[np.arange(n, dtype=np.int64) + high] = 1
    parts.append(np.packbits(upper, bitorder="little").tobytes())
    return b"".join(parts)


def decode(data: bytes, n: int, universe: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    l = low_bits(n, universe)
    lower_nbytes = (n * l + 7) // 8
    buf = np.frombuffer(data, dtype=np.uint8)
    upper_bits = np.unpackbits(buf[lower_nbytes:], bitorder="little")
    high = np.flatnonzero(upper_bits)[:n].astype(np.int64) - np.arange(
        n, dtype=np.int64
    )
    if l == 0:
        return high
    lower_bits_arr = np.unpackbits(buf[:lower_nbytes], bitorder="little")
    planes = lower_bits_arr[: n * l].reshape(n, l).astype(np.int64)
    low = planes @ (np.int64(1) << np.arange(l, dtype=np.int64))
    return (high << l) | low
