"""Custom stateful streaming operator: incremental sessionization.

The reference has no streaming surface (SURVEY.md §2.10); this is the
Structured-Streaming-native form of its one stateful operator shape
(T4 multi-row merge ≡ gap-based session assignment): per-key state
(`session count`, `last event time`) maintained across micro-batches
with ``applyInPandasWithState`` — the pattern for any custom stateful
operator this engine needs (rolling dedup windows, per-host crawl
budgets, incremental minhash unions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_sessions", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n_sessions", T.LongType()),
    T.StructField("last_ts", T.DoubleType()),
])

GAP_SECONDS = 1800.0


def _sessionize(key, pdf_iter, state: GroupState):
    import pandas as pd

    (user_id,) = key
    if state.exists:
        n_sessions, last_ts = state.get
    else:
        n_sessions, last_ts = 0, None

    batch = pd.concat(list(pdf_iter))
    batch = batch.sort_values(["ts", "event_id"])
    n_events = len(batch)

    for ts in batch["ts"]:
        t = ts.timestamp()
        if last_ts is None or t - last_ts > GAP_SECONDS:
            n_sessions += 1
        last_ts = t

    state.update((int(n_sessions), float(last_ts) if last_ts is not None else None))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_sessions": n_sessions, "n_events": n_events}]
    )


def stream_sessionize(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    available_now: bool = True,
):
    """readStream(events) → per-user stateful sessionization → parquet.

    With ``availableNow`` this drains the source and stops — the test
    backfill mode; without it the query tails the directory and state
    carries sessions across micro-batch boundaries.
    """
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .format("parquet")
        .load(input_path)
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id")
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            output_path
        )

    writer = (
        sessions.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
