"""Streaming ingestion for the link graph and the events table.

Patterns (all standard Structured Streaming, testable with
``trigger(availableNow=True)`` against file sources):

- ``read_edge_stream``: new edge files land in a directory → streaming
  DataFrame of (src, dst, event_time).  At production scale this is the
  Iceberg/Kafka ingest feeding incremental graph maintenance.
- ``incremental_degrees``: running out-degree per vertex maintained by
  the engine's streaming state store (complete-mode aggregation; at
  scale, checkpointed RocksDB state).  Degree is the first thing every
  app needs (PageRank divisors, triangle orientation) — keeping it
  fresh avoids a full O(E) recount per batch.
- ``windowed_event_stats``: watermarked tumbling-window counts/sums
  over the events table schema ``(event_id, ts, user_id, event_type,
  value, props)`` with late-data tolerance — append-mode output so
  each window finalizes exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_STREAM_SCHEMA = "src long, dst long, event_time timestamp"


def read_edge_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of edge parquet files landing in ``path``."""
    reader = (
        spark.readStream.schema(EDGE_STREAM_SCHEMA).format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def incremental_degrees(edge_stream: DataFrame) -> DataFrame:
    """Running out-degree per src — streaming stateful aggregation.
    Write with ``outputMode("complete")`` (or update + upsert sink)."""
    return edge_stream.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window per-type stats with a watermark for late rows:
    ``(window, event_type, n, total_value)``.  Append-mode safe — a
    window only emits once the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("window"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
    )


def run_to_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
) -> None:
    """Drain all available input to a parquet sink exactly once
    (``availableNow`` trigger) — the batch-refresh deployment shape,
    and what the tests drive."""
    (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
