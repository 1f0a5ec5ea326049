"""Stateless varint codec (reference parity: compression/Varint.java:19-48).

Encoding: little-endian 7-bit groups; the HIGH bit (0x80) is set on the
LAST byte of a value ("stop bit") — the inverse of standard LEB128
continuation.  Positive ints only (0 is not encodable; gaps and tfs are
never 0 in a posting list).

The encoder is numpy-vectorized: per-value byte counts are computed from
bit lengths, output bytes are scattered into a preallocated buffer.
"""

from __future__ import annotations

import numpy as np


def _byte_lengths(values: np.ndarray) -> np.ndarray:
    """Number of 7-bit groups needed per value (values > 0, < 2**63)."""
    nbits = np.frompyfunc(int.bit_length, 1, 1)(values.astype(object)).astype(np.int64)
    return np.maximum((nbits + 6) // 7, 1)


def varint_encode(values) -> bytes:
    """Encode a sequence of positive ints to the reference's varint format."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if (v.astype(np.int64) <= 0).any():
        raise ValueError("varint encodes positive values only")
    lens = _byte_lengths(v)
    total = int(lens.sum())
    out = np.zeros(total, dtype=np.uint8)
    # byte position of the first byte of each value
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    maxlen = int(lens.max())
    shifted = v.copy()
    for j in range(maxlen):
        mask = lens > j
        pos = starts[mask] + j
        out[pos] = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        shifted = shifted >> np.uint64(7)
    # stop bit on the last byte of each value
    out[starts + lens - 1] |= 0x80
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode the full buffer back to an int64 array (vectorized).

    The stop bit marks value boundaries, so decoding is a segmented
    reduction: group bytes by cumsum of stop flags.
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    stops = (b & 0x80) != 0
    if not stops[-1]:
        raise ValueError("truncated varint stream")
    # value index per byte: 0-based id of the value this byte belongs to
    vid = np.concatenate(([0], np.cumsum(stops)[:-1]))
    n = int(stops.sum())
    # position of each byte within its value
    starts_byte = np.concatenate(([0], np.nonzero(stops)[0][:-1] + 1))
    pos_in_val = np.arange(b.size) - starts_byte[vid]
    payload = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos_in_val.astype(np.uint64))
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, vid, payload)
    return out.astype(np.int64)
