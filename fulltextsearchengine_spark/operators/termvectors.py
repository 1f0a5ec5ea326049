"""Per-document term vectors (the Lucene/ES ``_termvectors`` API).

Given a handful of doc_ids, return each document's terms with local tf
and the dictionary's global df/cf — the forward-index view a relevance
engineer uses to debug "why does this doc score what it scores" and the
feature source for doc-side LTR features. The reference stores only the
inverted orientation (IndexReader.java:86-140 answers term→docs);
doc→terms is the transpose, served here without any new artifact.

Scale shape: the postings table is term-partitioned, so a doc_id filter
alone would scan every term's postings. Instead the doc-side tf comes
from re-tokenizing the requested documents (doc-count-sized work — the
same trick ES uses when term vectors weren't stored), and the global
df/cf attach via a join against the dictionary that BROADCASTS the tiny
doc-side term set, probing the vocabulary table once with no shuffle of
it. Requested docs are fetched with a pushed ``In(doc_id, …)`` scan.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from .index_build import InvertedIndex


def term_vectors(
    docs_text: DataFrame,
    index: InvertedIndex,
    doc_ids: Iterable[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, df, cf): term vector rows for ``doc_ids``.

    ``docs_text`` is any frame holding the documents' raw text keyed by
    ``id_col`` (the corpus source or a doc store); tokenization is the
    engine's own ``tokens_col``, so tf here is bit-identical to the
    indexed tf. Terms absent from ``index.terms`` cannot occur (the
    index was built by the same tokenizer); the inner join is a
    consistency assertion as much as an enrichment.
    """
    ids = sorted(set(int(d) for d in doc_ids))
    if not ids:
        raise ValueError("doc_ids must be non-empty")
    toks = (
        docs_text.filter(F.col(id_col).isin(ids))
        .select(F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("toks"))
        .select("doc_id", F.explode("toks").alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return index.terms.join(F.broadcast(tf), "term").select(
        "doc_id", "term", "tf", "df", "cf"
    )
