"""Watermarked windowed aggregation over an event stream — the
standard Structured Streaming shape (readStream → withWatermark →
window groupBy → writeStream) the engine uses for transcript-ingest
telemetry (turns/sec per conversation, late-arrival tolerant).

The reference has no streaming at all (SURVEY.md §2.9); this module is
part of the beyond-reference pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sums per key with late-data
    watermark. Works identically on a batch DataFrame (watermark is a
    no-op) and a streaming one (state cleanup + late-row drop)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    input_dir: str,
    schema,
    query_name: str = "event_counts",
    **agg_kwargs,
):
    """Drive the windowed aggregation as a real stream (availableNow)
    into a memory sink; returns the finished StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(stream, **agg_kwargs)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
