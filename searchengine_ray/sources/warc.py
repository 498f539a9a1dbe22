"""WET (WARC conversion-record) source and sink.

Web-scale text corpora ship as WET files — WARC/1.0 containers whose
``conversion`` records carry the extracted plain text of one page each
(public format: ISO 28500 / the Common Crawl WET convention). This
module provides

* ``docs_to_wet``  — serialize an Arrow batch of documents into one WET
  payload (bytes), leading ``warcinfo`` record included,
* ``parse_wet``    — byte-exact parser (Content-Length-driven slicing,
  no regex over payloads) returning an Arrow table,
* ``write_wet_dir`` / ``read_wet_dir`` — a Dataset-level roundtrip:
  one ``.warc.wet`` shard per input block via ``map_batches`` (the
  driver never sees payloads), read back with
  ``ray.data.read_binary_files`` + a parse ``map_batches``.

Parsing is per-file-shard and embarrassingly parallel; a 100 TB WET
corpus streams through as binary blocks with no shuffle.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"
_URI_PREFIX = "http://corpus.local/doc/"


def docs_to_wet(batch: pa.Table, text_column: str = "text") -> bytes:
    """One WET payload for a batch of (doc_id, text) rows."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch[text_column].to_pylist()
    out = []
    info_body = b"software: searchengine-ray\r\nformat: WARC File Format 1.0\r\n"
    out.append(
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: " + str(len(info_body)).encode() + _CRLF + _CRLF
    )
    out.append(info_body)
    out.append(_CRLF + _CRLF)
    for did, text in zip(doc_ids, texts):
        body = ("" if text is None else text).encode("utf-8")
        out.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            b"WARC-Target-URI: " + (_URI_PREFIX + str(did)).encode() + _CRLF
            + b"Content-Type: text/plain\r\n"
            b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF
        )
        out.append(body)
        out.append(_CRLF + _CRLF)
    return b"".join(out)


def parse_wet(data: bytes) -> pa.Table:
    """Parse one WET payload into (doc_id, text, n_bytes).

    Content-Length-driven: header block up to the first blank line,
    then exactly ``Content-Length`` payload bytes — payloads may
    contain anything, including lines that look like WARC headers."""
    doc_ids: list[int] = []
    texts: list[str] = []
    n_bytes: list[int] = []
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        header = data[pos:head_end].decode("utf-8", "replace")
        fields = {}
        for line in header.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", "0"))
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length + 4  # skip the two record-separator CRLFs
        if fields.get("warc-type") != "conversion":
            continue
        uri = fields.get("warc-target-uri", "")
        tail = uri.rsplit("/", 1)[-1]
        if tail.isdigit():
            doc_ids.append(int(tail))
        elif uri:
            # real-world WET records carry arbitrary URLs — derive a
            # stable 63-bit id from the URI instead of dying on int()
            doc_ids.append(zlib.crc32(uri.encode()) | (len(uri) << 32))
        else:
            doc_ids.append(-1)
        texts.append(body.decode("utf-8"))
        n_bytes.append(length)
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(doc_ids, np.int64)),
            "text": pa.array(texts, pa.string()),
            "n_bytes": pa.array(np.asarray(n_bytes, np.int64)),
        }
    )


def write_wet_dir(docs_ds, out_dir: str, text_column: str = "text"):
    """Serialize a documents Dataset to ``out_dir/*.warc.wet`` — one
    shard per block, written inside ``map_batches`` (driver sees only
    per-shard manifests). Returns the manifest as a pandas DataFrame."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # Ray may emit empty blocks
            return pa.table(
                {"path": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())}
            )
        payload = docs_to_wet(batch, text_column)
        lo = min(batch["doc_id"].to_pylist())
        path = os.path.join(out_dir, f"part-{lo:012d}.warc.wet")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)  # atomic: rerun-safe, no torn shards
        return pa.table(
            {"path": pa.array([path]), "n_docs": pa.array([batch.num_rows], pa.int64())}
        )

    return docs_ds.map_batches(dump, batch_format="pyarrow").to_pandas()


def read_wet_dir(in_dir: str):
    """WET directory → Dataset of (doc_id, text, n_bytes)."""
    import ray.data as rd

    files = rd.read_binary_files(in_dir, file_extensions=["wet"])

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_wet(b.as_py()) for b in batch["bytes"]]
        return pa.concat_tables(tables) if tables else parse_wet(b"")

    return files.map_batches(parse, batch_format="pyarrow")
