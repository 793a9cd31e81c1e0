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
    import numpy as np
    import pandas as pd

    (user_id,) = key
    if state.exists:
        n_sessions, last_ts = state.get
    else:
        n_sessions, last_ts = 0, None

    # gap-based sessionization REQUIRES the user's batch in time order,
    # so a full sort is semantically unavoidable — but only the ts
    # column is needed for it (ties in ts can't open a session whatever
    # the tiebreak, since gap 0 ≤ GAP_SECONDS).  Accumulate one float64
    # per event instead of whole rows: a hot user's batch costs 8 bytes
    # × events, not the full Arrow row width.
    chunks = []
    n_events = 0
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        n_events += len(pdf)
        chunks.append(pdf["ts"].astype("int64").to_numpy())  # ns since epoch
    ts_ns = np.sort(np.concatenate(chunks)) if chunks else np.array([], "int64")

    for t in ts_ns / 1e9:
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
