"""Transcript table source (the engine's only input).

Schema exactly per BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.

The reference's parser stack (parsing/LinesMemoryParser.java:21-48,
parsing/SequentialReviewParser.java:23-35, field coercion in
parsing/Review.java:41-88) reduces here to schema enforcement + light
coercion, because the input is already a structured table (SURVEY.md
§2.1). ``transcripts_from_documents`` deterministically reshapes the
driver's ``documents`` test table into transcript shape so every engine
operator can be cross-checked against an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_ROLES = ["user", "assistant", "system", "tool"]

# Number of synthetic conversations the documents-table reshape produces.
DOCS_N_CONVS = 50


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Read a transcripts parquet/Iceberg table and enforce the schema.

    Column coercion is the analog of the reference's field validation
    (parsing/Review.java:41-88): wrong-typed columns are cast, missing
    optional columns (tool, ts) become null, extra columns are dropped.
    """
    df = spark.read.parquet(path)
    cols = []
    for field in TRANSCRIPT_SCHEMA.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def transcripts_from_documents(spark: SparkSession, sf_dir: str, n_convs: int = DOCS_N_CONVS) -> DataFrame:
    """Deterministically reshape the driver's ``documents`` table
    (doc_id, text, lang, source, n_chars) into transcript shape.

    conv_id = doc_id % n_convs, turn_idx = doc_id // n_convs — a pure
    function of doc_id, so an ANSI-SQL oracle can derive the identical
    table (see TRANSCRIPTS_FROM_DOCUMENTS_SQL).
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.format_string("conv_%06d", (F.col("doc_id") % n_convs).cast("int")).alias("conv_id"),
        (F.col("doc_id") / n_convs).cast("int").alias("turn_idx"),
        F.element_at(F.array(*[F.lit(r) for r in _ROLES]), (F.col("doc_id") % 4 + 1).cast("int")).alias("role"),
        F.col("text").alias("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("search")).otherwise(F.lit(None).cast("string")).alias("tool"),
        (F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(mins=F.col("doc_id").cast("int"))).alias("ts"),
    )


# DuckDB CTE producing the identical table from the pre-registered
# `documents` view. Keep in lockstep with transcripts_from_documents().
TRANSCRIPTS_FROM_DOCUMENTS_SQL = f"""
    SELECT
        printf('conv_%06d', CAST(doc_id % {DOCS_N_CONVS} AS INT)) AS conv_id,
        CAST(doc_id // {DOCS_N_CONVS} AS INT) AS turn_idx,
        (['user','assistant','system','tool'])[CAST(doc_id % 4 AS INT) + 1] AS role,
        text,
        CASE WHEN doc_id % 3 = 0 THEN 'search' ELSE NULL END AS tool,
        TIMESTAMP '2026-01-01 00:00:00' + CAST(doc_id AS INT) * INTERVAL 1 MINUTE AS ts
    FROM documents
"""


def write_synthetic_transcripts(
    spark: SparkSession,
    path: str,
    n_turns: int = 1000,
    n_convs: int = 100,
    seed: int = 42,
    **kw,
) -> DataFrame:
    """Materialize the seeded synthetic transcript corpus (datagen.py) as
    parquet — the pytest/bench input (FIXTURES.md §1)."""
    from ..datagen import make_transcripts

    pdf = make_transcripts(n_turns=n_turns, n_convs=n_convs, seed=seed, **kw)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
