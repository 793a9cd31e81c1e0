"""Streaming face: file-source micro-batches through the same kernel,
drain with availableNow, verify parity with the batch pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor2_spark.plans.extract_job import run_extract
from pdf_extractor2_spark.sources.corpus import corpus_df
from pdf_extractor2_spark.streaming.stream_job import stream_extract


def test_stream_matches_batch(spark, tmp_path):
    pages = corpus_df(spark, 40, seed=13, pdf_share=0.2, num_partitions=2).cache()
    inp = str(tmp_path / "pages")
    pages.write.parquet(inp)

    q = stream_extract(
        spark,
        input_path=inp,
        output_path=str(tmp_path / "out"),
        metrics_path=str(tmp_path / "metrics"),
        checkpoint_path=str(tmp_path / "ckpt"),
        num_buckets=4,
    )
    q.awaitTermination(180)

    streamed = spark.read.parquet(str(tmp_path / "out"))
    batch = run_extract(pages, num_buckets=4)
    a = sorted((r["url"], r["raw_json"]) for r in streamed.select("url", "raw_json").collect())
    b = sorted((r["url"], r["raw_json"]) for r in batch.select("url", "raw_json").collect())
    assert a == b
    assert len(a) == 40

    metrics = spark.read.parquet(str(tmp_path / "metrics"))
    assert metrics.agg(F.sum("n_docs")).collect()[0][0] == 40


def test_stream_restart_is_idempotent(spark, tmp_path):
    """Re-starting the drained stream with the same checkpoint must write
    nothing new (exactly-once file-source progress tracking)."""
    pages = corpus_df(spark, 12, seed=29, pdf_share=0.0, num_partitions=1)
    inp = str(tmp_path / "pages")
    pages.write.parquet(inp)

    args = dict(
        input_path=inp,
        output_path=str(tmp_path / "out"),
        metrics_path=str(tmp_path / "metrics"),
        checkpoint_path=str(tmp_path / "ckpt"),
        num_buckets=2,
    )
    stream_extract(spark, **args).awaitTermination(120)
    first = spark.read.parquet(args["output_path"]).count()
    stream_extract(spark, **args).awaitTermination(120)
    again = spark.read.parquet(args["output_path"]).count()
    assert first == again == 12
