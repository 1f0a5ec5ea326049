"""Interleaved group-varint codec, bit-compatible with the reference format.

Format (reference: compression/GroupVarintEncoder.java:33-97,
GroupVarintDecoder.java:41-88, Design.md:12-34, explanation.txt):

- values are grouped 4 at a time;
- each group = 1 length byte + 4 big-endian bodies of 1..4 bytes each;
- the length byte packs (nbytes-1) in 2 bits per value, first value in
  the two MOST significant bits;
- a partial final group is padded with the value 0 (encoded in 1 byte,
  0x00), valid because gaps and term frequencies are never 0.

Values must fit in an unsigned 32-bit int (docID gaps / tfs are int32 in
the reference; we enforce the same bound per block and keep int64 at the
table level).

Encode and the gather step of decode are numpy-vectorized; decode first
derives group offsets with a 256-entry LUT scan (groups are bounded per
posting block, so the scan is short — the hot query path uses the
split-stream :mod:`streamvbyte` format instead, which needs no scan).
"""

from __future__ import annotations

import numpy as np

_POW256 = np.array([1 << 24, 1 << 16, 1 << 8, 1], dtype=np.uint64)

# LUT: length byte -> total body bytes of the group
_BODYLEN_LUT = np.array(
    [sum(((lb >> s) & 3) + 1 for s in (6, 4, 2, 0)) for lb in range(256)],
    dtype=np.int64,
)


def _nbytes(v: np.ndarray) -> np.ndarray:
    """Minimal big-endian byte length per value; 0 takes 1 byte."""
    nb = np.ones(v.shape, dtype=np.int64)
    nb[v > 0xFF] = 2
    nb[v > 0xFFFF] = 3
    nb[v > 0xFFFFFF] = 4
    return nb


def group_varint_encode(values) -> bytes:
    """Encode positive ints (plus 0-padding) into interleaved group varint."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if (v > 0xFFFFFFFF).any():
        raise ValueError("group varint encodes uint32 values only")
    pad = (-v.size) % 4
    if pad:
        v = np.concatenate([v, np.zeros(pad, dtype=np.uint64)])
    n = v.size
    ngroups = n // 4
    nb = _nbytes(v)
    nb4 = nb.reshape(ngroups, 4)
    len_bytes = (
        ((nb4[:, 0] - 1) << 6)
        | ((nb4[:, 1] - 1) << 4)
        | ((nb4[:, 2] - 1) << 2)
        | (nb4[:, 3] - 1)
    ).astype(np.uint8)

    # big-endian 4-byte view; keep only the last nb bytes of each value
    be = v.astype(">u4").view(np.uint8).reshape(n, 4)
    keep = np.arange(4)[None, :] >= (4 - nb)[:, None]
    bodies = be[keep]  # flattened, in value order

    group_body_len = nb4.sum(axis=1)
    total = int(ngroups + group_body_len.sum())
    out = np.empty(total, dtype=np.uint8)
    # offset of each group's length byte
    goff = np.concatenate(([0], np.cumsum(group_body_len + 1)[:-1]))
    out[goff] = len_bytes
    # body positions: all positions not occupied by a length byte
    body_mask = np.ones(total, dtype=bool)
    body_mask[goff] = False
    out[body_mask] = bodies
    return out.tobytes()


def group_varint_decode(buf: bytes, n: int | None = None) -> np.ndarray:
    """Decode ``n`` values (or all groups if None, including 0 padding)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    # sequential group-offset scan (short: blocks are bounded)
    goffs = []
    off = 0
    while off < b.size:
        goffs.append(off)
        off += 1 + int(_BODYLEN_LUT[b[off]])
    if off != b.size:
        raise ValueError("corrupt group varint stream")
    goffs = np.asarray(goffs, dtype=np.int64)
    len_bytes = b[goffs].astype(np.int64)
    # per-value byte counts, value-major order
    nb = np.stack([((len_bytes >> s) & 3) + 1 for s in (6, 4, 2, 0)], axis=1).ravel()
    # start offset of each value's body within the buffer
    ngroups = goffs.size
    body_start_in_group = np.concatenate(
        ([0], np.cumsum(nb)[:-1])
    ) - np.repeat(np.concatenate(([0], np.cumsum(nb.reshape(ngroups, 4).sum(axis=1))[:-1])), 4)
    vstart = np.repeat(goffs + 1, 4) + body_start_in_group
    # gather right-aligned 4-byte lanes
    lane = vstart[:, None] + (np.arange(4)[None, :] - (4 - nb)[:, None])
    valid = np.arange(4)[None, :] >= (4 - nb)[:, None]
    gathered = np.where(valid, b[np.clip(lane, 0, b.size - 1)], 0).astype(np.uint64)
    vals = (gathered * _POW256[None, :]).sum(axis=1).astype(np.int64)
    if n is not None:
        vals = vals[:n]
    return vals
