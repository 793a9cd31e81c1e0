"""Event-time windowed aggregation with a watermark.

Covers the late-data streaming surface: tumbling event-time windows over
the events stream, with a watermark bounding state retention.  In append
mode a window only emits once the watermark passes its end — late rows
beyond the watermark are dropped, bounding state at ~(watermark span /
window span) windows per key, which is what makes this runnable over an
unbounded 100 TB event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def stream_windowed_counts(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    window: str = "6 hours",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    events = (
        spark.readStream.schema(EVENTS_DDL)
        .format("parquet")
        .load(input_path)
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_windowed_counts(
    spark: SparkSession, sf_dir: str, window: str = "6 hours"
) -> DataFrame:
    """The batch equivalent (no watermark needed: bounded input)."""
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
