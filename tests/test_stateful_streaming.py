"""applyInPandasWithState sessionization: final streamed state must match
the batch window-function sessionization (plans/relational.py), including
when the input arrives split across multiple micro-batches."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pdf_extractor2_spark.plans.relational import sessionize_events
from pdf_extractor2_spark.streaming.stateful import stream_sessionize


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")

    # split by global event-time median so every user's second batch is
    # strictly later than their first — state must carry across batches
    epoch = F.col("ts").cast("timestamp").cast("double")
    median = events.select(epoch.alias("e")).approxQuantile("e", [0.5], 0.0)[0]

    grow = str(tmp_path / "grow")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    events.where(epoch <= median).write.mode("overwrite").parquet(grow)
    q = stream_sessionize(spark, grow, ckpt, out)
    q.awaitTermination(180)

    events.where(epoch > median).write.mode("append").parquet(grow)
    q = stream_sessionize(spark, grow, ckpt, out)
    q.awaitTermination(180)

    streamed = spark.read.parquet(out)
    latest = (
        streamed.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "n_sessions")
    )

    batch = sessionize_events(spark, sf).select("user_id", "n_sessions")
    a = sorted((r["user_id"], r["n_sessions"]) for r in latest.collect())
    b = sorted((r["user_id"], r["n_sessions"]) for r in batch.collect())
    assert a == b
