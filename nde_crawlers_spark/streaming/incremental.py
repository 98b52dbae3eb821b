"""Structured Streaming analogs of the reference's incremental semantics.

The reference harvests incrementally with date-window checkpoints
(``insert_last_updated(until)`` after each completed window,
figshare_oai-pmh/files/sql_database.py:415-470) and guards against stale
data (release-older-than-dumped -> RuntimeError, hub/dataload/nde.py:68-69).
Structured Streaming gives the same guarantees natively: per-microbatch
checkpointing, watermarks for late data, exactly-once file sinks.

These jobs run with ``Trigger.AvailableNow`` over a file source so tests
exercise real streaming plans (stateful aggregation + watermark) without
a long-running daemon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, src_dir: str, schema) -> DataFrame:
    # parquet timestamps load as TIMESTAMP_NTZ; watermarks require an
    # instant type — cast (session TZ is pinned to UTC in session.py).
    df = spark.readStream.schema(schema).parquet(src_dir)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(events: DataFrame, watermark: str = "1 hour", window: str = "1 hour") -> DataFrame:
    """Tumbling-window event counts with a watermark for late rows — the
    harvest-window aggregation shape (one output row per closed window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Drain everything currently available, checkpoint, stop — the
    batch-shaped streaming run used by the incremental-harvest tests.
    Append mode + watermark means only finalized windows are emitted,
    mirroring commit-only-after-window-completes
    (sql_database.py:465-467)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
