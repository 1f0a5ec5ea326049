"""Compression codecs for the posting-list / dictionary layer.

All codecs are numpy-vectorized and designed to run inside Arrow-batched
pandas UDFs (``applyInPandas`` / ``mapInPandas``) on executors — never
per-row Python.

- :mod:`varint`       — stateless LEB128-style varint with the reference's
                        stop-bit convention (0x80 set on the LAST byte;
                        reference: compression/Varint.java:19-48).
- :mod:`groupvarint`  — interleaved group varint, bit-compatible with the
                        reference's on-disk format (compression/
                        GroupVarintEncoder.java:33-97, Design.md:12-34).
- :mod:`streamvbyte`  — split-stream group varint (control bytes and data
                        bytes in separate streams, à la Lemire & Boytsov's
                        Stream VByte) used for our Parquet posting blocks:
                        decode is branch-free numpy, no sequential scan.
- :mod:`tfcodec`      — per-block tf-stream codec: constant / bit-packed
                        / Stream-VByte mode picked per block (tf≈1
                        dominates; closes the index-size gap to the
                        reference's 24%-of-raw).
- :mod:`delta`        — doc-gap encoding (np.diff / np.cumsum).
- :mod:`frontcoding`  — (k-1)-in-k front coding of the sorted term
                        dictionary, k=4 (compression/FrontCodingEncoder
                        .java:33-81, Dictionary.java:26).
"""

from .varint import varint_encode, varint_decode
from .groupvarint import group_varint_encode, group_varint_decode
from .streamvbyte import svb_encode, svb_decode
from .tfcodec import tf_encode, tf_decode
from .delta import gaps_encode, gaps_decode
from .frontcoding import front_code, front_decode

__all__ = [
    "varint_encode", "varint_decode",
    "group_varint_encode", "group_varint_decode",
    "svb_encode", "svb_decode",
    "tf_encode", "tf_decode",
    "gaps_encode", "gaps_decode",
    "front_code", "front_decode",
]
