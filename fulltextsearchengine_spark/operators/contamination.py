"""Benchmark decontamination — n-gram overlap against an eval set.

The standard pretraining hygiene step: flag (and drop) training
documents that share long word n-grams with benchmark/eval text, so the
model isn't graded on memorized training rows.

Spark shape: the benchmark is SMALL relative to the corpus (eval sets
are KBs–MBs; the corpus is TBs), so its distinct shingle set is
``broadcast()`` and the corpus-side probe is a broadcast hash join —
NO shuffle of the 100-TB side. Per-doc overlap counts come from the
partial-agg'd groupBy on the (tiny) join result.

Both sides shingle with dedup.doc_shingles (distinct word k-grams,
k=13 is the common contamination window; the gate uses a smaller k so
the synthetic corpus produces hits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, shared_ngrams, n_ngrams, contaminated): per corpus doc,
    how many of its distinct k-grams appear anywhere in the benchmark.
    Docs with no shingles (< k tokens) report 0 / not contaminated."""
    corp_sh = doc_shingles(corpus, k=k, id_col=id_col, text_col=text_col)
    bench_sh = (
        doc_shingles(benchmark, k=k, id_col=bench_id_col, text_col=bench_text_col)
        .select("shingle")
        .distinct()
    )
    sizes = corp_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    shared = (
        corp_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    ids = corpus.select(F.col(id_col).alias("doc_id"))
    return (
        ids.join(sizes, "doc_id", "left")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("shared_ngrams", F.lit(0)).cast("long").alias("shared_ngrams"),
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            (F.coalesce("shared_ngrams", F.lit(0)) >= min_shared).cast("int").alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    min_shared: int = 1,
    **kw,
) -> DataFrame:
    """Corpus rows whose overlap with the benchmark is below the
    threshold (the keep-side of the report)."""
    rep = contamination_report(corpus, benchmark, k=k, min_shared=min_shared, **kw)
    keep = rep.filter(F.col("contaminated") == 0).select("doc_id")
    id_col = kw.get("id_col", "doc_id")
    return corpus.join(keep.withColumnRenamed("doc_id", id_col), id_col, "left_semi")


__all__ = ["contamination_report", "decontaminate"]
