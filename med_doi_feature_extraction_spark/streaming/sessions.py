"""Streaming sessionization + late-data handling.

The reference is batch-only; its closest streaming analogue is the
progressive CSV flush / JSONL appends (SURVEY.md §2.9). This module
gives the engine a true Structured Streaming path for the same
semantics:

- ``streaming_sessions``: watermarked ``session_window`` aggregation —
  gap-merged sessions per entity, emitted once the watermark passes.
- ``streaming_dedupe``: ``dropDuplicatesWithinWatermark`` on the key —
  late re-crawl suppression.
- ``run_stream_once``: drive a parquet-backed stream to completion
  synchronously (memory sink) — the batch-equivalence harness; its
  output is cross-checked against the batch sessionizer in tests.

Batch/stream parity note: ``F.session_window`` merges rows whose gap
is STRICTLY LESS than the gap duration (a gap exactly equal to the
threshold starts a new session), matching the batch oracle in
``__spark_entry__.SQL_SESSION_WINDOW``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_sessions(
    events: DataFrame,
    entity: str,
    ts: str,
    gap_seconds: int,
    watermark: str = "1 hour",
    value_col: str | None = None,
) -> DataFrame:
    """Gap-based session aggregation over a (possibly streaming)
    DataFrame. With a streaming source, late rows beyond ``watermark``
    are dropped and sessions finalize exactly once."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias(f"{value_col}_sum"))
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
    # so the cast is value-preserving.
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(entity, F.session_window(ts, f"{gap_seconds} seconds"))
        .agg(*aggs)
        .select(
            entity,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            *([f"{value_col}_sum"] if value_col else []),
        )
    )


def streaming_dedupe(
    events: DataFrame, keys: list[str], ts: str, watermark: str = "1 hour"
) -> DataFrame:
    """Suppress duplicate keys arriving within the watermark window
    (late re-crawls of the same (url, warc_ts) snapshot)."""
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def run_stream_once(
    spark: SparkSession,
    source_dir: str,
    schema,
    transform,
    query_name: str = "stream_out",
) -> DataFrame:
    """Drive a parquet-dir stream through ``transform`` to completion
    (memory sink, synchronous) and return the result as a DataFrame."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = transform(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
