"""Streaming exact dedup parity: the converged per-digest state after
N micro-batches must equal the batch aggregate over all data, for any
split of the input (min/count are merge-associative)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pdf_extractor2_spark.streaming.dedup_stream import stream_exact_dedup


def test_stream_dedup_matches_batch(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    base = spark.read.parquet(f"{sf}/documents.parquet")
    # the testdata has no exact duplicates — clone 40 documents under new
    # doc_ids so duplicate digests exist, and deliver the clones in the
    # SECOND micro-batch so state must merge across the boundary
    clones = base.where(F.col("doc_id") < 40).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    docs = base.unionByName(clones)

    grow = str(tmp_path / "grow")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    base.write.mode("overwrite").parquet(grow)
    q = stream_exact_dedup(spark, grow, ckpt, out)
    q.awaitTermination(180)
    clones.write.mode("append").parquet(grow)
    q = stream_exact_dedup(spark, grow, ckpt, out)
    q.awaitTermination(180)

    latest = (
        spark.read.parquet(out)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("digest").orderBy(F.desc("batch_id"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("digest", "kept_doc_id", "n_seen")
    )
    batch = docs.groupBy(F.md5(F.col("text").cast("binary")).alias("digest")).agg(
        F.min("doc_id").alias("kept_doc_id"), F.count("*").alias("n_seen")
    )
    a = sorted(tuple(r) for r in latest.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert a == b and a  # non-empty, identical

    # at least one digest must actually have duplicates for the test to
    # exercise the merge path
    assert any(r[2] > 1 for r in b)
