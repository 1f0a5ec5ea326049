"""Corpus-wide exact paragraph/line deduplication (RefinedWeb-style).

Web-scale curation pipelines (CCNet, RefinedWeb §"line-wise
corrections", Dolma) drop REPEATED LINES across the whole corpus —
boilerplate navigation, cookie banners, license blocks — keeping only
the first occurrence, while the containing documents survive. This is
line-granular exact dedup, complementary to document-level exact/near
dedup (operators/dedup.py) and to duplicated n-gram SPAN removal
(dedup.remove_duplicate_spans): lines are a natural unit the author
chose, spans are tokenizer-defined.

Keep-first contract: occurrence order is (doc_id asc, line_idx asc) —
a pure function of the data, not of partitioning, so reruns and
engines agree. Lines shorter than ``min_chars`` (after trim) are never
candidates (RefinedWeb exempts short lines — "Home" appearing 10⁶
times is navigation, a 3-char line is just short).

Scale shape — deliberately agg-based, NOT window-based: keep-first
needs min(doc_id, line_idx) per distinct line. A window over
``partitionBy(line)`` would materialize every occurrence of a hot
boilerplate line in one task (a 10⁹-copy cookie banner = one straggler
partition). ``groupBy(line).agg(min(struct(doc_id, line_idx)))`` gets
map-side partial aggregation — each input partition contributes ONE row
per distinct line it holds, so the hot key arrives at the reducer
pre-collapsed. The join back to occurrences (line → first occurrence)
is the remaining skewed shape; AQE skew-join splitting handles it, and
the firsts side is distinct-line-sized. Reassembly is one groupBy on
doc_id with sort_array — one bounded exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """(doc_id, text, n_lines, n_removed): ``text`` with corpus-duplicated
    lines removed (first occurrence kept), preserving intra-doc line
    order and joining survivors back with ``sep``.

    A line is removed iff its exact trimmed form (length ≥ min_chars)
    occurs elsewhere in the corpus at an earlier (doc_id, line_idx).
    Empty/short lines always survive (they carry no dedup signal and
    removing them would silently reflow documents). Documents whose
    lines are all removed return ``text = ''`` — the caller decides
    whether empty docs drop (they usually feed a min-length filter).
    """
    if min_chars < 1:
        raise ValueError(f"min_chars must be ≥ 1, got {min_chars}")
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_idx", "line"),
    ).withColumn("line_t", F.trim(F.col("line")))
    eligible = lines.filter(F.length("line_t") >= min_chars)

    firsts = eligible.groupBy("line_t").agg(
        F.min(F.struct("doc_id", "line_idx")).alias("first_occ")
    )
    keep_flag = (
        F.length("line_t") < min_chars  # short lines always survive
    ) | (
        (F.col("first_occ.doc_id") == F.col("doc_id"))
        & (F.col("first_occ.line_idx") == F.col("line_idx"))
    )
    marked = lines.join(firsts, "line_t", "left").withColumn("keep", keep_flag)

    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct("line_idx", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("text"),
        )
        .select("doc_id", "text", "n_lines", F.col("n_removed").cast("long").alias("n_removed"))
    )
