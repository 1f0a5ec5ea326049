"""Codec tests: bit-exact goldens from the reference + property round-trips.

Goldens come from the reference's own unit tests (FIXTURES.md §4):
- GroupVarintEncoderTest.java:77-148 (full + partial group byte layout)
- FrontCodingEncoderTest.java:22-100 (ascii + multi-byte)
- VarintQuickcheck.java / GroupVarintQuickcheck.java (random round-trips)
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fulltextsearchengine_spark.codecs import (
    front_code,
    front_decode,
    gaps_decode,
    gaps_encode,
    group_varint_decode,
    group_varint_encode,
    svb_decode,
    svb_encode,
    varint_decode,
    varint_encode,
)


def bits(buf: bytes) -> str:
    return " ".join(format(b, "b") for b in buf)


class TestGroupVarintGoldens:
    def test_full_group_bit_exact(self):
        # reference golden: GroupVarintEncoderTest.java:92-95
        buf = group_varint_encode([10, 990, 99000, 1])
        assert len(buf) == 8
        assert bits(buf) == "11000 1010 11 11011110 1 10000010 10111000 1"
        assert group_varint_decode(buf, 4).tolist() == [10, 990, 99000, 1]

    def test_partial_group_bit_exact(self):
        # reference golden: GroupVarintEncoderTest.java:131-141
        buf = group_varint_encode([10, 990])
        assert len(buf) == 6
        assert bits(buf) == "10000 1010 11 11011110 0 0"
        assert group_varint_decode(buf, 2).tolist() == [10, 990]
        # padding decodes as the 0 sentinel when over-read
        assert group_varint_decode(buf).tolist() == [10, 990, 0, 0]

    def test_max_int32(self):
        vals = [2**31 - 1, 1, 2**31 - 1, 7, 300]
        buf = group_varint_encode(vals)
        assert group_varint_decode(buf, len(vals)).tolist() == vals

    def test_rejects_over_uint32(self):
        with pytest.raises(ValueError):
            group_varint_encode([2**32])


class TestFrontCodingGoldens:
    def test_jezebel_block(self):
        # reference golden: FrontCodingEncoderTest.java:22-72
        terms = ["jezebel", "jezer", "jezerit", "jeziah", "jeziel"]
        stream, plens, slens = front_code(terms)
        assert stream == b"jezebelritiahjeziel"
        assert list(zip(plens.tolist(), slens.tolist())) == [
            (0, 7), (4, 1), (5, 2), (3, 3), (0, 6),
        ]
        assert front_decode(stream, plens, slens) == terms

    def test_multibyte_utf8(self):
        # lengths are UTF-8 bytes (FrontCodingEncoderTest.java:74-100 uses Hebrew)
        terms = sorted(["שלום", "שלומית", "שלג", "abc", "abd"])
        stream, plens, slens = front_code(terms)
        assert front_decode(stream, plens, slens) == terms


class TestVarint:
    def test_known_small(self):
        # single-byte values: stop bit set -> value | 0x80
        assert varint_encode([1]) == bytes([0x81])
        assert varint_encode([127]) == bytes([0xFF])
        # 128 -> low 7 bits 0 (no stop), then 1 with stop
        assert varint_encode([128]) == bytes([0x00, 0x81])
        assert varint_decode(varint_encode([1, 127, 128, 300])).tolist() == [1, 127, 128, 300]

    def test_rejects_nonpositive(self):
        with pytest.raises(ValueError):
            varint_encode([0])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**31 - 1), min_size=0, max_size=300))
def test_varint_roundtrip(vals):
    assert varint_decode(varint_encode(vals)).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=0, max_size=300))
def test_group_varint_roundtrip(vals):
    buf = group_varint_encode(vals)
    assert group_varint_decode(buf, len(vals)).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=0, max_size=300))
def test_streamvbyte_roundtrip(vals):
    ctrl, data = svb_encode(vals)
    assert svb_decode(ctrl, data, len(vals)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=200, unique=True),
    st.integers(min_value=0, max_value=5),
)
def test_gaps_roundtrip(ids, prev):
    ids = sorted(i + prev for i in ids)
    gaps = gaps_encode(ids, prev=prev)
    assert gaps_decode(gaps, prev=prev).tolist() == ids


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=12), min_size=0, max_size=100))
def test_front_coding_roundtrip(terms):
    terms = sorted(set(terms))
    stream, plens, slens = front_code(terms)
    assert front_decode(stream, plens, slens) == terms


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=0, max_size=300))
def test_tfcodec_roundtrip(vals):
    from fulltextsearchengine_spark.codecs import tf_decode, tf_encode

    ctrl, data = tf_encode(vals)
    assert tf_decode(ctrl, data, len(vals)).tolist() == vals


def test_tfcodec_modes():
    """Mode selection: constant blocks cost 5+0 bytes; small-range blocks
    bit-pack; high-entropy blocks fall back to Stream-VByte."""
    import numpy as np

    from fulltextsearchengine_spark.codecs import tf_decode, tf_encode

    ctrl, data = tf_encode([1] * 128)  # the tf≈1 majority case
    assert ctrl[0] == 1 and len(ctrl) == 5 and data == b""
    assert tf_decode(ctrl, data, 128).tolist() == [1] * 128

    rng = np.random.RandomState(7)
    small = rng.randint(1, 4, size=128).tolist()  # range 1..3 → 2 bits/val
    ctrl, data = tf_encode(small)
    assert ctrl[0] == 2 and len(data) == (128 * 2 + 7) // 8
    assert tf_decode(ctrl, data, 128).tolist() == small

    # skewed: one huge outlier forces 31-bit packing (~500 B) while SVB
    # spends 1 byte on each small value (~165 B) → SVB mode must win
    skewed = [1] * 127 + [2**31]
    ctrl, data = tf_encode(skewed)
    assert ctrl[0] == 0
    assert tf_decode(ctrl, data, 128).tolist() == skewed
