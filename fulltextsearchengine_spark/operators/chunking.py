"""Document chunking + sequence packing — training-data shaping ops.

Not in the reference (search engine); these are the two operators every
pretraining data pipeline runs right before tokenizer/writer stages:

- ``chunk_documents``: split each document into fixed-size token windows
  with overlap (sliding-window chunking). Pure Catalyst: tokenize once,
  ``sequence`` over chunk starts, ``explode``, ``slice`` +
  ``array_join``. No shuffle at all — embarrassingly parallel over the
  scan, which is exactly what you want at 100 TB.

- ``pack_chunks``: greedy CONTIGUOUS packing of chunks into fixed token
  budgets (the "sequence packing" step that turns ragged docs into
  fixed-length training rows). pack_ord = floor(running_total/budget)
  where running_total is the cumulative token count over the pack key's
  chunk order — one window per pack key. Packing is keyed (default: per
  conversation) so the window partitions and scales; a GLOBAL ordered
  window would serialize on one task at 100 TB, so the global variant
  exists only for small-corpus tests (``pack_key=None``).

Chunks may overflow a budget by at most one chunk (greedy-with-overflow
— deterministic, standard, and exactly SQL-expressible for the oracle;
bin-perfect packing is NP-hard and order-destroying).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.tokenize import tokens_col


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, n_chunk_tokens, chunk_text): sliding token
    windows of ``chunk_tokens`` advancing by ``chunk_tokens - overlap``.
    Empty docs produce no chunks; a doc shorter than one window produces
    exactly one chunk."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    # number of windows: 1 + ceil(max(n - chunk, 0) / step)
    n_chunks = F.when(
        F.col("_n") <= 0, F.lit(0)
    ).otherwise(
        F.lit(1) + F.ceil(F.greatest(F.col("_n") - chunk_tokens, F.lit(0)) / step).cast("int")
    )
    # guard the empty case explicitly: sequence(0, -1) would yield a
    # DESCENDING [0, -1] in Spark, not an empty array
    idx_array = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    out = (
        toks.withColumn("chunk_idx", F.explode(idx_array))
        .withColumn("_start", F.col("chunk_idx") * step)
        .withColumn("_chunk", F.slice("_toks", F.col("_start") + 1, chunk_tokens))
        .select(
            "doc_id",
            "chunk_idx",
            F.size("_chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )
    return out


def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int = 512,
    pack_key=None,
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    tokens_col_name: str = "n_chunk_tokens",
) -> DataFrame:
    """(+ pack_id, pack_ord): greedy contiguous packing. ``pack_key`` is
    a column (name or Column) partitioning the packing — REQUIRED shape
    at scale (per-conv, per-shard, per-date...); None = one global
    ordered window (tests/small corpora only: it serializes).

    pack_ord = floor(exclusive_running_total / budget): a chunk opens a
    new pack when the tokens before it already fill the current budget.
    """
    if pack_key is None:
        w = Window.orderBy(*order_cols)
        key_cols = []
    else:
        key = F.col(pack_key) if isinstance(pack_key, str) else pack_key
        w = Window.partitionBy(key).orderBy(*order_cols)
        key_cols = [key.alias("_pk")]
    running_excl = F.sum(tokens_col_name).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    out = chunks.select(*chunks.columns, *key_cols).withColumn(
        "pack_ord",
        F.floor(F.coalesce(running_excl, F.lit(0)) / budget_tokens).cast("long"),
    )
    if pack_key is None:
        return out.withColumn("pack_id", F.col("pack_ord").cast("string"))
    return out.withColumn(
        "pack_id", F.concat_ws("#", F.col("_pk").cast("string"), F.col("pack_ord"))
    ).drop("_pk")


__all__ = ["chunk_documents", "pack_chunks"]
