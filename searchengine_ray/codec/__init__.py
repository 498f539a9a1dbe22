"""Posting-list compression codecs (delta + varbyte, naive int32)."""

from .varbyte import (
    DeltaVarLenCodec,
    NaiveCodec,
    decode,
    decode_nodelta,
    delta_encode,
    encode,
    encode_nodelta,
    varbyte_decode,
    varbyte_encode,
)

__all__ = [
    "DeltaVarLenCodec",
    "NaiveCodec",
    "encode",
    "decode",
    "encode_nodelta",
    "decode_nodelta",
    "delta_encode",
    "varbyte_encode",
    "varbyte_decode",
]
