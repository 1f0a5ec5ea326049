"""Split-stream group varint ("Stream VByte", Lemire & Boytsov 2017).

Same 2-bit-per-value length codes and big-endian minimal bodies as the
reference's group varint (compression/GroupVarintEncoder.java:33-97), but
control bytes and data bytes live in SEPARATE streams.  With the control
stream available up front, per-value byte lengths — and therefore all
body offsets — are a single vectorized cumsum: decode is branch-free
numpy with no sequential offset scan.  This is the codec used inside our
Parquet posting blocks (columns ``ctrl``/``data``); the interleaved
format in :mod:`groupvarint` is kept for reference-format parity tests.
"""

from __future__ import annotations

import numpy as np

_POW256 = np.array([1 << 24, 1 << 16, 1 << 8, 1], dtype=np.uint64)


def _nbytes(v: np.ndarray) -> np.ndarray:
    nb = np.ones(v.shape, dtype=np.int64)
    nb[v > 0xFF] = 2
    nb[v > 0xFFFF] = 3
    nb[v > 0xFFFFFF] = 4
    return nb


def svb_encode(values) -> tuple[bytes, bytes]:
    """Encode uint32 values -> (ctrl, data) byte streams."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", b""
    if (v > 0xFFFFFFFF).any():
        raise ValueError("stream vbyte encodes uint32 values only")
    n = v.size
    pad = (-n) % 4
    if pad:
        v = np.concatenate([v, np.zeros(pad, dtype=np.uint64)])
    nb = _nbytes(v)
    if pad:  # padding values occupy 0 data bytes; their ctrl bits read as 1-byte 0
        nb[n:] = 0
    codes = np.where(nb > 0, nb - 1, 0).reshape(-1, 4)
    ctrl = (
        (codes[:, 0] << 6) | (codes[:, 1] << 4) | (codes[:, 2] << 2) | codes[:, 3]
    ).astype(np.uint8)
    be = v.astype(">u4").view(np.uint8).reshape(-1, 4)
    keep = np.arange(4)[None, :] >= (4 - np.maximum(nb, 1))[:, None]
    keep[nb == 0] = False
    data = be[keep]
    return ctrl.tobytes(), data.tobytes()


def svb_decode(ctrl: bytes, data: bytes, n: int) -> np.ndarray:
    """Decode exactly ``n`` values. Fully vectorized (no offset scan)."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    c = np.frombuffer(ctrl, dtype=np.uint8).astype(np.int64)
    d = np.frombuffer(data, dtype=np.uint8)
    nb = np.stack([((c >> s) & 3) + 1 for s in (6, 4, 2, 0)], axis=1).ravel()[:n]
    # trailing pad slots inside the last ctrl byte decode as garbage — sliced off by [:n]
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    lane = starts[:, None] + (np.arange(4)[None, :] - (4 - nb)[:, None])
    valid = np.arange(4)[None, :] >= (4 - nb)[:, None]
    gathered = np.where(valid, d[np.clip(lane, 0, max(d.size - 1, 0))], 0).astype(np.uint64)
    return (gathered * _POW256[None, :]).sum(axis=1).astype(np.int64)
