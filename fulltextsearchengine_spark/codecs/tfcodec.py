"""Per-block term-frequency stream codec with low-entropy fast paths.

The reference's final index reaches ~24% of raw corpus size
(analysis/analysis2.tex:97); plain Stream-VByte tfs left us at 27.5%
because tf == 1 dominates real posting blocks (~1.25 B/posting spent
encoding a constant). This codec picks, per block, the cheapest of
three modes and records it in a 1-byte header prefixed to the control
stream (VERDICT r2 "next round" #4):

  mode 0 — Stream-VByte (ctrl = 0x00 + svb ctrl, data = svb data):
           the general fallback, byte-identical payload to before.
  mode 1 — constant (ctrl = 0x01 + uint32 LE value, data = empty):
           every tf in the block equal — the tf≈1 majority case costs
           5 bytes per BLOCK instead of ~1.25 B per posting.
  mode 2 — bit-packed (ctrl = 0x02 + bits byte + uint32 LE min,
           data = (tf - min) packed big-endian at `bits` bits each):
           small-range blocks (e.g. tfs in 1..3 → 2 bits/posting).

Gap streams keep pure Stream-VByte (gaps are high-entropy; svb is
already near their byte-aligned floor). Decode stays branch-free numpy
per mode; mode 1 — the hot case — is a single np.full.
"""

from __future__ import annotations

import numpy as np

from .streamvbyte import svb_decode, svb_encode


def tf_encode(values) -> tuple[bytes, bytes]:
    """uint32 tf values -> (ctrl, data) with a 1-byte mode header on ctrl."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return b"\x00", b""
    if (v < 0).any() or (v > 0xFFFFFFFF).any():
        raise ValueError("tf codec encodes uint32 values only")
    lo, hi = int(v.min()), int(v.max())
    if lo == hi:
        return b"\x01" + lo.to_bytes(4, "little"), b""
    bits = int(hi - lo).bit_length()
    packed_bytes = (v.size * bits + 7) // 8
    s_ctrl, s_data = svb_encode(v)
    if packed_bytes + 6 < len(s_ctrl) + len(s_data) + 1:
        rel = (v - lo).astype(np.uint64)
        vb = ((rel[:, None] >> np.arange(bits - 1, -1, -1).astype(np.uint64)) & 1).astype(
            np.uint8
        )
        return (
            b"\x02" + bytes([bits]) + lo.to_bytes(4, "little"),
            np.packbits(vb.ravel()).tobytes(),
        )
    return b"\x00" + s_ctrl, s_data


def tf_decode(ctrl: bytes, data: bytes, n: int) -> np.ndarray:
    """Decode exactly ``n`` tf values (int64 array)."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    mode = ctrl[0]
    if mode == 0:
        return svb_decode(ctrl[1:], data, n)
    if mode == 1:
        return np.full(n, int.from_bytes(ctrl[1:5], "little"), dtype=np.int64)
    if mode == 2:
        bits = ctrl[1]
        lo = int.from_bytes(ctrl[2:6], "little")
        raw = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * bits)
        weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.int64)
        return (raw.reshape(n, bits).astype(np.int64) * weights[None, :]).sum(axis=1) + lo
    raise ValueError(f"unknown tf codec mode {mode}")
