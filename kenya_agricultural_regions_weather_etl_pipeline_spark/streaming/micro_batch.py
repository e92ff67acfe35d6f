"""Structured Streaming analogue of the reference's daily micro-batch
(SURVEY.md §2.7).

The reference is externally-scheduled daily batch append
(/root/reference/daily_weather_etl_kenya.py:62) with upsert-by-key for
late/replayed data (:425-451) and a per-day quality rollup (:483-524).
Structured Streaming expresses the same semantics natively:

- ``trigger(availableNow=True)``  = the scheduled micro-batch run
- ``withWatermark(event_time)``   = bounded lateness for state cleanup
- ``dropDuplicatesWithinWatermark`` = the keyed dedup of replays
- tumbling ``window()`` agg       = the per-day rollup

Scale notes: state is keyed by (window/event key) and pruned by the
watermark — memory-bounded regardless of stream length; shuffle is the
usual keyed exchange per micro-batch.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type over event time ``ts``.

    Works on BOTH a batch and a streaming DataFrame (the watermark is a
    no-op in batch) — the batch twin is the driver-oracle check.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def run_available_now(
    spark: SparkSession,
    events_parquet_dir: str,
    schema,
    window: str = "1 hour",
    sink_table: str = "stream_counts",
) -> DataFrame:
    """Execute the micro-batch stream to completion and return the result.

    readStream(parquet) → windowed agg → memory sink (complete mode) —
    ``availableNow`` processes the full backlog then stops, exactly the
    reference's externally-triggered daily run.
    """
    stream = (
        spark.readStream.schema(schema).parquet(events_parquet_dir)
    )
    agg = windowed_event_counts(stream, window=window)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(sink_table)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_table)


def dedup_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Streaming keyed dedup of replays — the streaming twin of the
    reference upsert's no-duplicate invariant (:112, :425)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_dedup_available_now(
    spark: SparkSession,
    events_parquet_dir: str,
    schema,
    keys: list[str],
    sink_table: str = "stream_dedup",
) -> DataFrame:
    stream = spark.readStream.schema(schema).parquet(events_parquet_dir)
    deduped = dedup_within_watermark(stream, keys)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            deduped.writeStream.format("memory")
            .queryName(sink_table)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_table)
