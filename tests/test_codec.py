"""Codec tests: byte-exact golden vectors ported from the reference
(``index/positional/Team3CompressorTest.java:25-107``) + property tests."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.codec import (
    DeltaVarLenCodec,
    NaiveCodec,
    decode,
    decode_nodelta,
    encode,
    encode_nodelta,
)

CODEC = DeltaVarLenCodec()


class TestGoldenVectors:
    def test_encode_deltas_of_one(self):  # Team3CompressorTest.test1
        assert CODEC.encode([1, 2, 3, 4, 5, 6]) == bytes([0x01] * 6)

    def test_encode_two_byte_groups(self):  # test2
        assert CODEC.encode([128, 384, 896, 1920, 3968]) == bytes(
            [0x81, 0x00, 0x82, 0x00, 0x84, 0x00, 0x88, 0x00, 0x90, 0x00]
        )

    def test_encode_int_max(self):  # test3
        assert CODEC.encode([2**31 - 1]) == bytes([0x87, 0xFF, 0xFF, 0xFF, 0x7F])

    def test_decode_roundtrips(self):  # test4-6
        for vals in ([1, 2, 3, 4, 5, 6], [128, 384, 896, 1920, 3968], [2**31 - 1]):
            assert CODEC.decode(CODEC.encode(vals)) == vals

    def test_partial_decode_fresh_chain(self):  # test7, test8
        b1 = bytes([0x01] * 6)
        assert CODEC.decode(b1, 4, 2) == [1, 2]
        b2 = bytes([0x81, 0x00, 0x82, 0x00, 0x84, 0x00, 0x88, 0x00, 0x90, 0x00])
        assert CODEC.decode(b2, 4, 6) == [512, 1536, 3584]

    def test_unsorted_raises(self):  # DeltaVarLenCompressor.java:27
        with pytest.raises(ValueError, match="array is not sorted"):
            CODEC.encode([5, 3])

    def test_empty(self):
        assert CODEC.encode([]) == b""
        assert CODEC.decode(b"") == []

    def test_zero_start(self):
        assert CODEC.encode([0, 0, 1]) == bytes([0x00, 0x00, 0x01])


class TestNaiveCodec:
    def test_big_endian_int32(self):
        nc = NaiveCodec()
        assert nc.encode([1, 256]) == bytes([0, 0, 0, 1, 0, 0, 1, 0])
        assert nc.decode(nc.encode([7, 1000, 123456])) == [7, 1000, 123456]

    def test_compression_ratio_beats_naive(self):
        # reference Team6IndexCompressionTest: delta+varbyte < 2/3 of naive
        ids = np.cumsum(np.random.default_rng(42).integers(1, 30, 10_000))
        assert len(encode(ids)) < (2 / 3) * len(NaiveCodec().encode(ids.tolist()))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300)
)
def test_roundtrip_sorted(values):
    arr = np.sort(np.array(values, dtype=np.int64))
    assert decode(encode(arr)).tolist() == arr.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300)
)
def test_roundtrip_nodelta(values):
    arr = np.array(values, dtype=np.int64)
    assert decode_nodelta(encode_nodelta(arr)).tolist() == arr.tolist()


def test_vectorized_matches_scalar_reference_impl():
    # independent scalar re-implementation of the wire format as an oracle
    def scalar_encode(vals):
        out = bytearray()
        prev = 0
        for v in vals:
            delta, prev = v - prev, v
            groups = [delta & 0x7F]
            delta >>= 7
            while delta > 0:
                groups.append(delta & 0x7F | 0x80)
                delta >>= 7
            out.extend(reversed(groups))
        return bytes(out)

    rng = np.random.default_rng(7)
    vals = np.cumsum(rng.integers(0, 5000, 2000))
    assert encode(vals) == scalar_encode(vals.tolist())


class TestBatchedBlockDecode:
    def test_dec_many_equals_per_block(self):
        import numpy as np

        from searchengine_ray.codec.posting import (
            DeltaVarbytePostingCodec as DV,
            NaivePostingCodec as NV,
        )

        rng = np.random.default_rng(3)
        vals = np.cumsum(rng.integers(1, 50, 1000)).astype(np.int64)  # sorted ids
        plain = rng.integers(1, 1000, 1000).astype(np.int64)
        bounds = np.array([0, 128, 256, 900, 1000], dtype=np.int64)
        counts = np.diff(bounds)
        for codec in (DV, NV):
            sb = codec.enc_sorted_blocks(vals, bounds)
            pb = codec.enc_plain_blocks(plain, bounds)
            per_block = np.concatenate([codec.dec_sorted(b) for b in sb])
            np.testing.assert_array_equal(codec.dec_sorted_many(sb, counts), per_block)
            np.testing.assert_array_equal(codec.dec_sorted_many(sb, counts), vals)
            np.testing.assert_array_equal(codec.dec_plain_many(pb, counts), plain)
            # subset of blocks (the decode_blocks hit-set path)
            sub = [1, 3]
            sub_counts = counts[sub]
            got = codec.dec_sorted_many([sb[i] for i in sub], sub_counts)
            want = np.concatenate([vals[bounds[i]:bounds[i+1]] for i in sub])
            np.testing.assert_array_equal(got, want)
