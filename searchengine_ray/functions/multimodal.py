"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted in actor-pool ``map_batches`` stages.

The image/audio libraries are not available in this environment, so the
actual pixel/sample decode is STUBBED (`NotImplementedError` behind a
try-import) and replaced by a deterministic fake container format — the
Ray-side plumbing (schema, batch sizing, actor signature, output layout)
is real and tested:

Fake container format (``FAKEIMG`` / ``FAKEAUD``):
``magic:7s | width:u16 | height:u16 | payload bytes`` — payload length is
``width*height`` (image) or ``width*256`` (audio frames)."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC_IMG = b"FAKEIMG"
MAGIC_AUD = b"FAKEAUD"
MAGIC_VID = b"FAKEVID"


def synth_payload(doc_id: int, kind: str = "img") -> bytes:
    """Deterministic fake payload for a doc id."""
    w = 8 + (doc_id % 9)
    h = 8 + (doc_id % 7)
    if kind == "vid":
        n_frames = 4 + (doc_id % 13)
        rng = np.random.default_rng((1234, doc_id))
        body = rng.integers(0, 256, n_frames * w * h, dtype=np.int64).astype(np.uint8)
        return MAGIC_VID + struct.pack("<HHH", w, h, n_frames) + body.tobytes()
    n = w * h if kind == "img" else w * 256
    rng = np.random.default_rng((1234, doc_id))
    body = rng.integers(0, 256, n, dtype=np.int64).astype(np.uint8).tobytes()
    magic = MAGIC_IMG if kind == "img" else MAGIC_AUD
    return magic + struct.pack("<HH", w, h) + body


def add_payload_batch(batch: pa.Table, kind: str = "img", id_column: str = "doc_id") -> pa.Table:
    ids = batch[id_column].to_numpy(zero_copy_only=False)
    if kind == "bmp":
        payloads = [synth_bmp_payload(int(i)) for i in ids]
    elif kind == "png":
        payloads = [synth_png_payload(int(i)) for i in ids]
    elif kind == "gif":
        payloads = [synth_gif_payload(int(i)) for i in ids]
    elif kind == "wav":
        payloads = [synth_wav_payload(int(i)) for i in ids]
    else:
        payloads = [synth_payload(int(i), kind) for i in ids]
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


# --------------------------------------------------------- real BMP codec
#
# Uncompressed 24-bit BMP needs no image library — the container is a
# 54-byte header + bottom-up BGR rows padded to 4 bytes. This is a REAL
# image decode path (not the FAKEIMG stand-in): any bona fide 24-bit
# .bmp file decodes here; PIL-only formats (JPEG/PNG) stay stubbed.


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=stride * h, offset=offset)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return img[::-1] if flip else img


def synth_bmp_payload(doc_id: int) -> bytes:
    """Deterministic real BMP for a doc id: pixel (y, x) gray value
    ``(7*x + 13*y + doc_id) % 256`` — closed-form, so the SQL oracle can
    recompute per-image mean intensity exactly."""
    w = 8 + (doc_id % 9)
    h = 8 + (doc_id % 7)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    gray = ((7 * x + 13 * y + doc_id) % 256).astype(np.uint8)
    return encode_bmp(np.repeat(gray[:, :, None], 3, axis=2))


# --------------------------------------------------------- real WAV codec
#
# PCM WAV needs no audio library either — RIFF container, "fmt " chunk
# (format=1, 16-bit) + "data" chunk. This is a REAL audio decode path:
# any bona fide 16-bit PCM .wav decodes here; compressed audio
# (MP3/OGG/FLAC) stays behind the NotImplementedError stub.


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 samples ``(n,)`` or ``(n, channels)`` → PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    pad = b"\x00" if len(data) % 2 else b""
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data + pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (int16 samples ``(n, channels)``, sample_rate).
    Walks the chunk list (any order, pad bytes honored)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    fmt = data = None
    while pos + 8 <= min(end, len(payload)):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(f"only 16-bit PCM WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, ch), sample_rate


def synth_wav_payload(doc_id: int, sample_rate: int = 8000) -> bytes:
    """Deterministic real WAV for a doc id: ``64 + id%33`` samples of an
    alternating ±``(100 + id%900)`` square wave — RMS equals the
    amplitude exactly and the wave crosses zero at every step, so the
    SQL oracle recomputes every feature in closed form."""
    n = 64 + (doc_id % 33)
    a = 100 + (doc_id % 900)
    samples = np.full(n, a, np.int16)
    samples[1::2] = -a
    return encode_wav(samples, sample_rate)


class AudioFeatureStage:
    """Actor-pool stage: decode PCM WAV payloads → per-clip features
    (sample count / rate / channels, RMS, zero-crossing count), all
    numpy-vectorized per clip. Compressed formats raise the honest
    NotImplementedError stub. Same memory rule as DecodeStage: binary
    rows are wide, keep ``batch_size`` small."""

    def __init__(self, payload_column: str = "payload"):
        self.payload_column = payload_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_column].to_pylist()
        n_samp = np.empty(len(payloads), np.int64)
        rates = np.empty(len(payloads), np.int64)
        chans = np.empty(len(payloads), np.int64)
        rms = np.empty(len(payloads), np.float64)
        zc = np.empty(len(payloads), np.int64)
        for i, p in enumerate(payloads):
            if p[:4] != b"RIFF":
                _real_image_decode(p)  # raises NotImplementedError
            samples, sr = decode_wav(p)
            mono = samples.mean(axis=1, dtype=np.float64)
            n_samp[i], chans[i], rates[i] = samples.shape[0], samples.shape[1], sr
            rms[i] = np.sqrt(np.mean(mono**2)) if len(mono) else 0.0
            zc[i] = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        out = batch.drop_columns([self.payload_column])
        out = out.append_column("n_samples", pa.array(n_samp, pa.int64()))
        out = out.append_column("sample_rate", pa.array(rates, pa.int64()))
        out = out.append_column("n_channels", pa.array(chans, pa.int64()))
        out = out.append_column("rms", pa.array(np.round(rms, 6), pa.float64()))
        out = out.append_column("zero_crossings", pa.array(zc, pa.int64()))
        return out


def _real_image_decode(payload: bytes):  # pragma: no cover - env has no PIL
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires PIL; this environment ships none — "
            "use the deterministic FAKEIMG container instead"
        ) from e


class DecodeStage:
    """Actor-pool stage: parse the payload container → typed metadata +
    byte-histogram features. ``concurrency=N`` in map_batches makes this
    a real actor pool; per-actor state is the (here trivial) decoder
    setup. Batch sizes must stay small for wide binary rows
    (ray_guide: memory-aware batch sizing)."""

    def __init__(self, n_bins: int = 16, payload_column: str = "payload"):
        self.n_bins = n_bins
        self.payload_column = payload_column
        self.edges = np.linspace(0, 256, n_bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_column].to_pylist()
        widths = np.empty(len(payloads), np.int32)
        heights = np.empty(len(payloads), np.int32)
        sums = np.empty(len(payloads), np.int64)
        kinds, hists = [], []
        for i, p in enumerate(payloads):
            if p[:2] == b"BM":  # real 24-bit BMP decode (no image lib)
                img = decode_bmp(p)
                body = img[:, :, 0].ravel()  # gray: channels identical
                kinds.append("image/bmp")
                heights[i], widths[i] = img.shape[:2]
            elif p[:8] == _PNG_SIG:  # real PNG decode (stdlib zlib only)
                img = decode_png(p)
                body = img.ravel() if img.ndim == 2 else img[:, :, 0].ravel()
                kinds.append("image/png")
                heights[i], widths[i] = img.shape[:2]
            elif p[:6] in (b"GIF87a", b"GIF89a"):  # real GIF decode (own LZW)
                img = decode_gif(p)
                body = img.ravel()
                kinds.append("image/gif")
                heights[i], widths[i] = img.shape[:2]
            else:
                magic, (w, h) = p[:7], struct.unpack("<HH", p[7:11])
                if magic not in (MAGIC_IMG, MAGIC_AUD):
                    _real_image_decode(p)  # raises NotImplementedError
                kinds.append("image" if magic == MAGIC_IMG else "audio")
                widths[i], heights[i] = w, h
                body = np.frombuffer(p[11:], dtype=np.uint8)
            sums[i] = int(body.sum(dtype=np.int64))
            hist, _ = np.histogram(body, bins=self.edges)
            hists.append((hist / max(len(body), 1)).tolist())
        out = batch.drop_columns([self.payload_column])
        out = out.append_column("kind", pa.array(kinds, pa.string()))
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height", pa.array(heights, pa.int32()))
        out = out.append_column("sum_intensity", pa.array(sums, pa.int64()))
        out = out.append_column("features", pa.array(hists, pa.list_(pa.float64())))
        return out


class FrameSampleStage:
    """Actor-pool stage: sample every k-th frame of a FAKEVID container →
    one row per kept frame (flat_map-shaped: the output has more rows
    than the input). Real video decode would sit behind the same
    signature; large payloads need small ``batch_size`` (memory-aware
    batch sizing, ray_guide)."""

    def __init__(self, every_k: int = 4, payload_column: str = "payload"):
        self.every_k = every_k
        self.payload_column = payload_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_column].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_frame, out_w, out_h, out_mean = [], [], [], [], []
        for i, p in enumerate(payloads):
            magic = p[:7]
            if magic != MAGIC_VID:
                _real_image_decode(p)  # raises NotImplementedError
            w, h, n_frames = struct.unpack("<HHH", p[7:13])
            body = np.frombuffer(p[13:], dtype=np.uint8)[: n_frames * w * h]
            frames = body.reshape(n_frames, h * w)
            for f in range(0, n_frames, self.every_k):
                out_id.append(int(ids[i]))
                out_frame.append(f)
                out_w.append(w)
                out_h.append(h)
                out_mean.append(round(float(frames[f].mean()), 6))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame": pa.array(out_frame, pa.int32()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "mean_intensity": pa.array(out_mean, pa.float64()),
            }
        )


class ResizeStage:
    """2× nearest-neighbor downsample. Real pixel path for BMP payloads
    (decode → subsample → re-encode); FAKEIMG containers subsample their
    byte grid the same way."""

    def __init__(self, payload_column: str = "payload"):
        self.payload_column = payload_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_column].to_pylist()
        out = []
        for p in payloads:
            if p[:2] == b"BM":
                img = decode_bmp(p)
                out.append(encode_bmp(np.ascontiguousarray(img[::2, ::2])))
                continue
            magic, (w, h) = p[:7], struct.unpack("<HH", p[7:11])
            body = np.frombuffer(p[11:], dtype=np.uint8)
            if magic == MAGIC_IMG:
                nw, nh = max(1, w // 2), max(1, h // 2)
                img = body[: w * h].reshape(h, w)
                small = img[::2, ::2][:nh, :nw]
                out.append(magic + struct.pack("<HH", nw, nh) + small.tobytes())
            else:
                out.append(p)
        idx = batch.column_names.index(self.payload_column)
        return batch.set_column(idx, self.payload_column, pa.array(out, pa.binary()))


# --------------------------------------------------------- real PNG codec
#
# PNG needs no image library either: the container is chunked
# (IHDR/IDAT/IEND with CRC32), pixel data is zlib-deflated scanlines,
# each prefixed by a filter byte (0=None 1=Sub 2=Up 3=Average 4=Paeth).
# stdlib zlib supplies the only nontrivial part, so this is a REAL
# decoder: any bona fide non-interlaced 8-bit gray/RGB/RGBA PNG decodes
# here. Interlaced (Adam7) and palette/16-bit stay behind
# NotImplementedError. Spec: PNG (ISO/IEC 15948), RFC 2083.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA → PNG
    bytes. ``filter_type`` applies the same PNG filter to every scanline
    (tests roundtrip all five against the decoder's unfilter)."""
    import zlib

    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            filt = (row.astype(np.int16) - ((left.astype(np.int16) + prev) // 2)).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            filt = (row.astype(np.int16) - _paeth(left, prev, ul)).astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (a=left, b=up, c=up-left)."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w) uint8 gray or (h, w, ch) uint8. Non-interlaced
    8-bit gray/RGB/RGBA; all five scanline filters unfiltered."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, b"", None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, color, comp, flt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in _PNG_CHANNELS or interlace:
        raise NotImplementedError(
            f"only non-interlaced 8-bit gray/RGB/RGBA PNG (depth={depth}, "
            f"color={color}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int16)
    for y in range(h):
        ft, row = int(raw[y, 0]), raw[y, 1:].astype(np.int16)
        if ft == 0:
            rec = row
        elif ft == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            lanes = row.reshape(w, ch)
            rec = (np.cumsum(lanes.astype(np.int64), axis=0) & 0xFF).astype(np.int16).reshape(-1)
        else:  # Average / Paeth: left-dependence → per-pixel scan
            rec = np.empty(stride, np.int16)
            for x in range(w):
                for c_ in range(ch):
                    i = x * ch + c_
                    left = rec[i - ch] if x else 0
                    up = prev[i]
                    ul = prev[i - ch] if x else 0
                    if ft == 3:
                        pred = (int(left) + int(up)) // 2
                    elif ft == 4:
                        pred = int(_paeth(np.array([left]), np.array([up]), np.array([ul]))[0])
                    else:
                        raise ValueError(f"unknown PNG filter {ft}")
                    rec[i] = (row[i] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
        prev = out[y].astype(np.int16)
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def synth_png_payload(doc_id: int) -> bytes:
    """Deterministic real grayscale PNG for a doc id: pixel (y, x) value
    ``(3*x + 11*y + doc_id) % 256`` — closed-form, so the SQL oracle
    recomputes the exact integer pixel sum."""
    w = 8 + (doc_id % 8)
    h = 8 + (doc_id % 5)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    gray = ((3 * x + 11 * y + doc_id) % 256).astype(np.uint8)
    return encode_png(gray, filter_type=(doc_id % 5))


# --------------------------------------------------------- real GIF codec
#
# GIF87a with the variable-width LZW the format specifies — a different
# compression family from PNG's DEFLATE, implemented from the public
# spec with no image library. Grayscale global palette (i, i, i), so
# palette indices ARE intensities. Width-growth pairing is the standard
# one (encoder grows at next_code == 2^width + 1, decoder at
# next_code == 2^width — the encoder's table runs one entry ahead);
# verified by dense roundtrips incl. 12-bit growth + dictionary resets,
# and by decoding the canonical 1×1 spec fixture.

_GIF_MAX_CODE = 4096


def _gif_lzw_encode(indices: np.ndarray, mcs: int = 8) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code, width = eoi + 1, mcs + 1
    emit(clear, width)
    w = b""
    for k in indices.tobytes():
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= _GIF_MAX_CODE - 1:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = eoi + 1, mcs + 1
        w = bytes([k])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = np.empty(n_pixels, np.uint8)
    pos = 0
    acc = 0
    nbits = 0
    bi = 0

    def read(width: int) -> int:
        nonlocal acc, nbits, bi
        while nbits < width:
            if bi >= len(data):
                return eoi  # stream ended without explicit EOI (legal)
            acc |= data[bi] << nbits
            bi += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = mcs + 1
    prev: bytes | None = None
    while pos < n_pixels:
        code = read(width)
        if code == eoi:
            break
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table {len(table)}")
        out[pos : pos + len(entry)] = np.frombuffer(entry, np.uint8)
        pos += len(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if pos != n_pixels:
        raise ValueError(f"GIF pixel underrun: {pos}/{n_pixels}")
    return out


def encode_gif(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 gray → GIF87a bytes (256-entry grayscale palette)."""
    h, w = pixels.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])  # GCT present, 8-bit, 256 entries
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(8)  # LZW min code size
    lzw = _gif_lzw_encode(np.ascontiguousarray(pixels).ravel())
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → (h, w) uint8 intensity (palette red channel).

    Handles GIF87a/89a, global palette, extension blocks (skipped),
    one image descriptor, variable-width LZW with resets."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        intro = payload[pos]
        if intro == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif intro == 0x2C:
            left, top, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
            iflags = payload[pos + 9]
            pos += 10
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF")
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if palette is None:
                raise ValueError("GIF without a palette")
            idx = _gif_lzw_decode(bytes(data), mcs, w * h)
            return palette[idx, 0].reshape(h, w)
        elif intro == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{intro:02x}")
    raise ValueError("GIF without an image descriptor")


def synth_gif_payload(doc_id: int) -> bytes:
    """Deterministic grayscale GIF per doc id: pixel (y, x) value
    ``(5*x + 7*y + doc_id) % 256`` — closed-form for the SQL oracle."""
    w = 8 + (doc_id % 7)
    h = 8 + (doc_id % 6)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    gray = ((5 * x + 7 * y + doc_id) % 256).astype(np.uint8)
    return encode_gif(gray)
