"""Raw-text transcript parsers — the reference's parser stack, Spark-first.

The reference ingests a line-oriented key/value text file (Amazon review
dumps) through three parsers:

- S1 ``LinesMemoryParser`` (parsing/LinesMemoryParser.java:21-48):
  stateful line scan accumulating ``product/productId``-style fields,
  emitting a record when the ``review/text`` field arrives.
- S2 ``SequentialReviewParser`` (parsing/SequentialReviewParser.java:23-35):
  arbitrarily-large files, splitting the stream on a record-start
  delimiter (``Scanner.useDelimiter("(?=product/productId)")``).
- S3 ``InMemoryReviewParser`` regex field extraction + S4 coercion
  (parsing/Review.java:36-88): malformed numerics fall back to defaults
  (helpfulness -> 0/1, score -> 1), out-of-range values clamped,
  flipped fractions swapped.

Spark-first re-expression: instead of a stateful driver-side scan, the
*datasource* splits records (``spark.read.text`` with a custom
``lineSep`` record delimiter — each record block becomes one row, in
parallel across file splits), and field extraction is Catalyst
``regexp_extract`` — whole-stage-codegen, no Python in the pipeline.
Coercion mirrors Review.fromFields defaulting: unparsable turn_idx -> 0,
negative clamped to 0, unknown role -> 'user', missing text -> '',
missing tool/ts -> null.

Record format (the transcript analog of the reference's block format)::

    conv/id: conv_000042
    turn/idx: 3
    turn/role: assistant
    turn/tool: search
    turn/ts: 2026-01-01 00:03:00
    turn/text: the single-line turn text

records separated by a blank line. A single-line log format
(``parse_transcript_log_lines``) covers the S3 regex-parse shape:

    2026-01-01 00:03:00 | conv_000042#3 | assistant | tool=search | text
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .transcripts import TRANSCRIPT_SCHEMA

_ROLE_SET = ["user", "assistant", "system", "tool"]

# The reference's review/text is single-line by construction; transcript
# turns are not, so the block writer escapes backslash and newline
# (log-file convention) and the parser unescapes. Unescape uses a NUL
# sentinel for the escaped backslash (raw transcript text is NUL-free).


def _escape_text(col):
    return F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"), "\n", r"\\n")


def _unescape_text(col):
    c = F.regexp_replace(col, r"\\\\", "\x00")
    c = F.regexp_replace(c, r"\\n", "\n")
    return F.regexp_replace(c, "\x00", r"\\")

# record delimiter: blank line between blocks (reference splits on the
# record-start key instead; a trailing separator is equivalent and
# splittable by the datasource)
RECORD_SEP = "\n\n"


def _field(col, key: str):
    """Extract ``key: value`` from a record block (multiline regex).

    Reference analog: the key-prefix match in LinesMemoryParser.parse
    (LinesMemoryParser.java:26-43) — ``line.substring(colonPos + 2)``
    i.e. exactly one space after the colon, rest of line verbatim.
    """
    return F.regexp_extract(col, r"(?m)^" + key + r": (.*)$", 1)


def _coerce(raw: DataFrame) -> DataFrame:
    """S4 field coercion, mirroring Review.fromFields defaulting
    (parsing/Review.java:41-88): unparsable -> default, out-of-range ->
    clamped, never a dropped record."""
    turn_idx = F.col("turn_idx_raw").try_cast("int")
    turn_idx = F.when(turn_idx.isNull() | (turn_idx < 0), F.lit(0)).otherwise(turn_idx)
    role = F.lower(F.trim(F.col("role_raw")))
    role = F.when(role.isin(_ROLE_SET), role).otherwise(F.lit("user"))
    tool = F.when(F.col("tool_raw") == "", None).otherwise(F.col("tool_raw"))
    return raw.select(
        F.col("conv_id_raw").alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        F.col("text_raw").alias("text"),
        tool.cast("string").alias("tool"),
        F.try_to_timestamp(F.when(F.col("ts_raw") == "", None).otherwise(F.col("ts_raw"))).alias("ts"),
    )


def parse_transcript_blocks(records: DataFrame, col: str = "value") -> DataFrame:
    """Parse a DataFrame of record blocks (one block per row) into the
    transcript schema. Pure Catalyst — six regexp_extract + coercion."""
    c = F.col(col)
    raw = records.select(
        _field(c, "conv/id").alias("conv_id_raw"),
        _field(c, "turn/idx").alias("turn_idx_raw"),
        _field(c, "turn/role").alias("role_raw"),
        _unescape_text(_field(c, "turn/text")).alias("text_raw"),
        _field(c, "turn/tool").alias("tool_raw"),
        _field(c, "turn/ts").alias("ts_raw"),
    )
    # a block with no conv/id field is not a record (reference: fields
    # before the first productId key are discarded)
    return _coerce(raw.where(F.col("conv_id_raw") != ""))


def read_transcript_blocks(spark: SparkSession, path: str) -> DataFrame:
    """S1+S2: read a raw block-format text file of any size; the
    datasource splits on the record separator so parsing parallelizes
    across file splits (the Spark answer to SequentialReviewParser's
    buffered single-threaded scan)."""
    records = spark.read.option("lineSep", RECORD_SEP).text(path)
    return parse_transcript_blocks(records)


# ---------------------------------------------------------------------------
# single-line log format (S3 regex-parse shape)

LOG_LINE_RE = (
    r"^([^|]*) \| ([^|#]*)#(\d+) \| ([^|]*) \| tool=([^|]*) \| (.*)$"
)


def parse_transcript_log_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse ``ts | conv#idx | role | tool=x | text`` lines into the
    transcript schema. Lines WITHOUT a parseable conv_id (regex no-match
    or empty conv field) are discarded — a record can't exist without
    its key; only field-LEVEL malformations (bad ts, bad role, …) coerce
    to defaults (Review.fromFields policy, webdata/Review.java)."""
    c = F.col(col)
    raw = lines.select(
        F.regexp_extract(c, LOG_LINE_RE, 2).alias("conv_id_raw"),
        F.regexp_extract(c, LOG_LINE_RE, 3).alias("turn_idx_raw"),
        F.regexp_extract(c, LOG_LINE_RE, 4).alias("role_raw"),
        F.regexp_extract(c, LOG_LINE_RE, 6).alias("text_raw"),
        F.regexp_extract(c, LOG_LINE_RE, 5).alias("tool_raw"),
        F.regexp_extract(c, LOG_LINE_RE, 1).alias("ts_raw"),
    )
    return _coerce(raw.where(F.col("conv_id_raw") != ""))


def format_transcript_blocks(df: DataFrame) -> DataFrame:
    """Serialize transcript rows to the block format (round-trip /
    export path). One ``value`` column per record, no separator — write
    with ``.write.option("lineSep", RECORD_SEP).text(path)``."""
    return df.select(
        F.concat_ws(
            "\n",
            F.concat(F.lit("conv/id: "), F.col("conv_id")),
            F.concat(F.lit("turn/idx: "), F.col("turn_idx").cast("string")),
            F.concat(F.lit("turn/role: "), F.col("role")),
            *[
                F.when(
                    F.col(c).isNotNull(),
                    F.concat(F.lit(f"turn/{c}: "), F.col(c).cast("string")),
                )
                for c in ("tool", "ts")
            ],
            F.concat(F.lit("turn/text: "), _escape_text(F.col("text"))),
        ).alias("value")
    )


def write_transcript_blocks(df: DataFrame, path: str) -> None:
    formatted = format_transcript_blocks(df)
    formatted.write.mode("overwrite").option("lineSep", RECORD_SEP).text(path)


__all__ = [
    "parse_transcript_blocks",
    "read_transcript_blocks",
    "parse_transcript_log_lines",
    "format_transcript_blocks",
    "write_transcript_blocks",
    "RECORD_SEP",
    "LOG_LINE_RE",
    "TRANSCRIPT_SCHEMA",
]
