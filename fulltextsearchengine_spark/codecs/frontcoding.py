"""(k-1)-in-k front coding of a sorted term dictionary, k=4.

Reference format (compression/FrontCodingEncoder.java:33-81,
FrontCodingDecoder.java:43-72, Dictionary.java:26 BLOCK_SIZE=4,
analysis/analysis.tex:40-59):

- terms arrive sorted; every k-th term is a block LEADER stored whole
  (prefix_len 0);
- each follower stores (prefix_len w.r.t. the PREVIOUS term, suffix_len)
  and only its suffix bytes;
- all suffixes are concatenated into one byte stream.

Lengths are in BYTES of the UTF-8 encoding (the reference stores UTF-8
and slices byte-wise; its tests include Hebrew multi-byte cases,
FrontCodingEncoderTest.java:74-100).

Golden example (FrontCodingEncoderTest.java:22-72):
``jezebel jezer jezerit jeziah jeziel`` ->
stream ``jezebelritiahjeziel``,
(prefix_len, suffix_len) = (0,7),(4,1),(5,2),(3,3),(0,6).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 4


def _common_prefix_len(a: bytes, b: bytes) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


def front_code(terms, k: int = BLOCK_SIZE) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Sorted terms -> (suffix stream, prefix_lens, suffix_lens)."""
    chunks: list[bytes] = []
    n = len(terms)
    prefix_lens = np.zeros(n, dtype=np.int64)
    suffix_lens = np.zeros(n, dtype=np.int64)
    prev: bytes = b""
    for i, term in enumerate(terms):
        t = term.encode("utf-8") if isinstance(term, str) else bytes(term)
        if i % k == 0:
            p = 0
        else:
            p = _common_prefix_len(prev, t)
        prefix_lens[i] = p
        suffix_lens[i] = len(t) - p
        chunks.append(t[p:])
        prev = t
    return b"".join(chunks), prefix_lens, suffix_lens


def front_decode(stream: bytes, prefix_lens, suffix_lens, k: int = BLOCK_SIZE) -> list[str]:
    """Inverse of :func:`front_code`."""
    prefix_lens = np.asarray(prefix_lens, dtype=np.int64)
    suffix_lens = np.asarray(suffix_lens, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(suffix_lens)[:-1]))
    out: list[str] = []
    prev = b""
    for i in range(prefix_lens.size):
        suffix = stream[offs[i] : offs[i] + suffix_lens[i]]
        t = prev[: prefix_lens[i]] + suffix
        out.append(t.decode("utf-8"))
        prev = t
    return out
