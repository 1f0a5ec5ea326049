"""Doc-gap (delta) encoding of ascending docID runs.

Reference: inverted_index/PostingListWriter.java:55-57 (gap = docId -
lastDocId, per posting list), PostingListReader.java:63-67 (cumsum).
``prev`` lets a posting list be split into blocks: block b stores gaps
relative to the last docID of block b-1, so blocks decode independently
given their ``first_doc_id`` (we store absolute first/last per block).
"""

from __future__ import annotations

import numpy as np


def gaps_encode(doc_ids, prev: int = 0) -> np.ndarray:
    """Ascending positive doc_ids -> positive gaps (first gap vs ``prev``)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return d
    gaps = np.diff(d, prepend=np.int64(prev))
    if (gaps <= 0).any():
        raise ValueError("doc_ids must be strictly ascending and > prev")
    return gaps


def gaps_decode(gaps, prev: int = 0) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.int64)
    if g.size == 0:
        return g
    return np.cumsum(g) + np.int64(prev)
