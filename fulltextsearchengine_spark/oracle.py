"""Pure-pandas oracle: independent reimplementation of the reference
engine's semantics, used as the golden source for every Spark test
(mirrors the reference's own method — datasets/testScenarioBuilder.py
builds golden JSON that IndexReaderIntegrationTest asserts against).

NOTHING in here touches Spark. Everything is plain python/numpy/pandas
so a bug cannot be shared between engine and oracle.

Semantics pinned to the reference (file:line in /root/reference):

- tokenize: split ``[^A-Za-z0-9]+``, drop empties, lowercase
  (parsing/Tokenizer.java:9,17-22 — ASCII-only on purpose).
- docID: dense 1-based rank over stable (conv_id, turn_idx) ordering
  (analog of arrival-order docIDs, IndexWriter.java:47-58).
- vectorSpaceSearch = lnn.ltc (ReviewSearch.java:27-104): query ltc =
  (1+log10 tf)·log10(N/df), df=0 terms dropped, cosine-normalized;
  doc lnn = 1+log10 tf restricted to query terms; score = dot; OR
  candidates; ties score desc then docId asc.
- languageModelSearch (ReviewSearch.java:146-199): candidates = union;
  score = Π over DISTINCT query terms of λ·tf/len + (1−λ)·cf/total —
  raw float64 product in sorted-term order (the reference multiplies in
  HashSet iteration order, which is unspecified; we fix sorted order).
- conv_search = productSearch analog (ReviewSearch.java:235-284):
  relevancy(conv) = Σ dots of the conv's candidate docs / #docs(conv);
  stage 1 takes top-k by relevancy (tie-break conv_id asc — documented
  deviation: reference stage-1 tie order is nondeterministic); stage 2
  re-sorts those k by rank desc (rank = mean dot over ALL of the conv's
  docs, the helpfulness-free analog of getProductRank), tie conv_id asc.
- BM25 (north-star scale path; no reference code — standard Robertson/
  Sparck-Jones): idf = ln((N−df+0.5)/(df+0.5)+1), k1=1.2, b=0.75,
  score = Σ idf·tf·(k1+1)/(tf + k1·(1−b+b·len/avgdl)); OR candidates;
  ties score desc then docId asc.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd

TOKEN_SPLIT = re.compile(r"[^A-Za-z0-9]+")

BM25_K1 = 1.2
BM25_B = 0.75
LM_LAMBDA = 0.5


def tokenize(text: str) -> list[str]:
    """Reference tokenizer: split on non-alphanumeric, drop empties, lowercase."""
    if text is None:
        return []
    return [t.lower() for t in TOKEN_SPLIT.split(text) if t]


def assign_doc_ids(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Dense 1-based docIDs over stable (conv_id, turn_idx) order."""
    df = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    df = df.copy()
    df["doc_id"] = range(1, len(df) + 1)
    return df


def build_index(transcripts: pd.DataFrame) -> dict:
    """Golden index contents per FIXTURES.md §2."""
    docs = assign_doc_ids(transcripts)
    term_to_postings: dict[str, list[int]] = {}
    doc_to_length: dict[int, int] = {}
    conv_to_doc_ids: dict[str, list[int]] = {}
    doc_to_meta: dict[int, dict] = {}
    total_tokens = 0

    for row in docs.itertuples(index=False):
        toks = tokenize(row.text)
        doc_to_length[row.doc_id] = len(toks)
        total_tokens += len(toks)
        conv_to_doc_ids.setdefault(row.conv_id, []).append(row.doc_id)
        doc_to_meta[row.doc_id] = {
            "conv_id": row.conv_id,
            "turn_idx": int(row.turn_idx),
            "role": row.role,
            "tool": None if row.tool is None or (isinstance(row.tool, float) and math.isnan(row.tool)) else row.tool,
        }
        for term, tf in sorted(Counter(toks).items()):
            term_to_postings.setdefault(term, []).extend([row.doc_id, tf])

    term_to_cf = {t: sum(p[1::2]) for t, p in term_to_postings.items()}
    term_to_df = {t: len(p) // 2 for t, p in term_to_postings.items()}

    return {
        "total_tokens": total_tokens,
        "unique_tokens": len(term_to_postings),
        "num_docs": len(docs),
        "term_to_postings": term_to_postings,
        "term_to_collection_frequency": term_to_cf,
        "term_to_document_frequency": term_to_df,
        "doc_to_length": doc_to_length,
        "conv_to_doc_ids": conv_to_doc_ids,
        "doc_to_meta": doc_to_meta,
    }


# --------------------------------------------------------------------------
# scorers — all take the golden index dict


def _postings_map(index: dict, term: str) -> dict[int, int]:
    flat = index["term_to_postings"].get(term, [])
    return dict(zip(flat[0::2], flat[1::2]))


def _query_ltc(index: dict, query: list[str]) -> dict[str, float]:
    """ReviewSearch.queryLtc (ReviewSearch.java:27-58): tf over RAW-case
    terms, df looked up on the folded term (lookup-time lowercasing,
    IndexReader.java:93,125); normalized per-variant weights collapse
    onto the folded key (doc lnn depends only on the folded term)."""
    n = index["num_docs"]
    tf = Counter(query)  # RAW terms
    vec_raw: dict[str, float] = {}
    for variant, f in tf.items():
        df = index["term_to_document_frequency"].get(variant.lower(), 0)
        if df == 0:
            continue  # df=0 terms dropped from the query vector
        vec_raw[variant] = (1.0 + math.log10(f)) * math.log10(n / df)
    norm = math.sqrt(sum(w * w for w in vec_raw.values()))
    vec: dict[str, float] = {}
    for variant in sorted(vec_raw):
        t = variant.lower()
        vec[t] = vec.get(t, 0.0) + (vec_raw[variant] / norm if norm > 0 else 0.0)
    return vec


def _doc_lnns(index: dict, query: list[str]) -> dict[int, dict[str, float]]:
    """ReviewSearch.docLnns (ReviewSearch.java:65-82): OR candidates;
    lookups fold case (IndexReader.java:93), keys are folded terms."""
    out: dict[int, dict[str, float]] = {}
    for term in {t.lower() for t in query}:
        for doc_id, tf in _postings_map(index, term).items():
            out.setdefault(doc_id, {})[term] = 1.0 + math.log10(tf)
    return out


def vector_space_search(index: dict, query: list[str], k: int) -> list[tuple[int, float]]:
    qvec = _query_ltc(index, query)
    scored = []
    for doc_id, lnn in _doc_lnns(index, query).items():
        dot = sum(qvec.get(t, 0.0) * w for t, w in sorted(lnn.items()))
        scored.append((doc_id, dot))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def language_model_search(
    index: dict, query: list[str], k: int, lam: float = LM_LAMBDA
) -> list[tuple[int, float]]:
    terms = sorted(set(query))
    total = index["total_tokens"]
    candidates: set[int] = set()
    tdf = {t: _postings_map(index, t) for t in terms}
    for m in tdf.values():
        candidates.update(m)
    scored = []
    for doc_id in candidates:
        length = index["doc_to_length"][doc_id]
        score = 1.0
        for t in terms:
            mle = tdf[t].get(doc_id, 0) / length
            smooth = index["term_to_collection_frequency"].get(t, 0) / total
            score *= lam * mle + (1.0 - lam) * smooth
        scored.append((doc_id, score))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def bm25_search(
    index: dict, query: list[str], k: int, k1: float = BM25_K1, b: float = BM25_B
) -> list[tuple[int, float]]:
    n = index["num_docs"]
    avgdl = index["total_tokens"] / n if n else 0.0
    acc: dict[int, float] = {}
    for term in sorted(set(query)):
        df = index["term_to_document_frequency"].get(term, 0)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for doc_id, tf in _postings_map(index, term).items():
            length = index["doc_to_length"][doc_id]
            denom = tf + k1 * (1.0 - b + b * length / avgdl)
            acc[doc_id] = acc.get(doc_id, 0.0) + idf * tf * (k1 + 1.0) / denom
    scored = sorted(acc.items(), key=lambda x: (-x[1], x[0]))
    return scored[:k]


ROLE_WEIGHTS = {"user": 1.0, "assistant": 0.5}
ROLE_WEIGHT_DEFAULT = 0.25


def conv_search(index: dict, query: list[str], k: int) -> list[tuple[str, float, float]]:
    """productSearch analog -> [(conv_id, relevancy, rank)] in final
    order. Stage 1: relevancy = Σ candidate dots / n_docs. Stage 2
    re-ranks the k winners by the role-weighted mean dot over ALL conv
    turns (getProductRank analog — role weight plays the part of the
    reference's helpfulness weight, ReviewSearch.java:203-229)."""
    qvec = _query_ltc(index, query)
    doc_dots: dict[int, float] = {}
    for doc_id, lnn in _doc_lnns(index, query).items():
        doc_dots[doc_id] = sum(qvec.get(t, 0.0) * w for t, w in sorted(lnn.items()))
    meta = index["doc_to_meta"]
    doc_conv = {d: m["conv_id"] for d, m in meta.items()}
    sum_dots: dict[str, float] = {}
    for doc_id, dot in doc_dots.items():
        cid = doc_conv[doc_id]
        sum_dots[cid] = sum_dots.get(cid, 0.0) + dot
    relevancy = {
        cid: s / len(index["conv_to_doc_ids"][cid]) for cid, s in sum_dots.items()
    }
    stage1 = sorted(relevancy.items(), key=lambda x: (-x[1], x[0]))[:k]

    def w(d: int) -> float:
        return ROLE_WEIGHTS.get(meta[d]["role"], ROLE_WEIGHT_DEFAULT)

    def rank(cid: str) -> float:
        ids = index["conv_to_doc_ids"][cid]
        num = sum(w(d) * doc_dots.get(d, 0.0) for d in ids)
        return num / sum(w(d) for d in ids)

    final = sorted(stage1, key=lambda x: (-rank(x[0]), x[0]))
    return [(cid, rel, rank(cid)) for cid, rel in final]
