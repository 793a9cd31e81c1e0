"""Watermarked stream-stream interval join.

The last Structured-Streaming surface the engine needed: joining two
unbounded streams (here the view stream with the purchase stream of the
same events source) on an equality key plus an event-time interval —
"which purchases happened within `horizon` AFTER a view by the same
user".  This is the streaming attribution primitive (ad-click → buy,
crawl-fetch → parse-success, …).

Why it scales: BOTH sides carry a watermark and the join condition
bounds the event-time distance, so Spark can expire buffered rows once
the watermark passes their reach — state is O(rows inside the horizon
window), independent of stream length.  Without the time bound (or the
watermarks) a stream-stream inner join must buffer each side forever.

The converged append-mode output equals the batch interval join over
the same data for any micro-batch split — pinned by
tests/test_join_streaming.py, including a pair whose view and purchase
arrive in DIFFERENT micro-batches (the cross-batch buffered-state
match) and an outside-horizon pair that must NOT join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _sides(events: DataFrame):
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return views, purchases


_PROJECTION = [
    "v_user",
    "view_id",
    "purchase_id",
    "view_ts",
    "purchase_ts",
    "purchase_value",
]


def stream_view_purchase_join(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    horizon: str = "2 hours",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """readStream(events) → split into view/purchase streams → watermarked
    interval join (purchase in (view_ts, view_ts + horizon]) → parquet."""
    events = (
        spark.readStream.schema(EVENTS_DDL)
        .format("parquet")
        .load(input_path)
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value")
    )
    views, purchases = _sides(events)
    joined = (
        views.withWatermark("view_ts", watermark)
        .join(
            purchases.withWatermark("purchase_ts", watermark),
            F.expr(
                f"v_user = p_user AND purchase_ts > view_ts"
                f" AND purchase_ts <= view_ts + interval {horizon}"
            ),
        )
        .select(*_PROJECTION)
    )
    writer = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_view_purchase_join(
    spark: SparkSession, sf_dir: str, horizon: str = "2 hours"
) -> DataFrame:
    """The batch equivalent (bounded input, no watermark needed)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    views, purchases = _sides(events)
    return (
        views.join(
            purchases,
            F.expr(
                f"v_user = p_user AND purchase_ts > view_ts"
                f" AND purchase_ts <= view_ts + interval {horizon}"
            ),
        )
        .select(*_PROJECTION)
    )


def view_purchase_attribution_sql(horizon_hours: int = 2) -> str:
    """DuckDB twin of the batch interval join (driver oracle)."""
    return f"""
        WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                          event_type, value
                   FROM events),
        v AS (SELECT user_id AS v_user, event_id AS view_id, ts AS view_ts
              FROM e WHERE event_type = 'view'),
        p AS (SELECT user_id AS p_user, event_id AS purchase_id,
                     ts AS purchase_ts, value AS purchase_value
              FROM e WHERE event_type = 'purchase')
        SELECT v_user, view_id, purchase_id, view_ts, purchase_ts,
               purchase_value
        FROM v JOIN p ON v_user = p_user
                      AND purchase_ts > view_ts
                      AND purchase_ts <= view_ts + INTERVAL {horizon_hours} HOUR
    """
