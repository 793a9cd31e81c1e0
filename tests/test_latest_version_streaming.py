"""Streaming recrawl-dedup parity: the converged per-url state after N
micro-batches must equal the batch ``latest_page_version`` aggregate
over all data, for any split of the input (max-by-epoch and count are
merge-associative) — including when the newest capture of a url arrives
in an EARLIER micro-batch than an older capture (out-of-order recrawl
delivery: the state must keep the newest epoch, not the last arrival)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pdf_extractor2_spark.operators.webcorpus import latest_page_version
from pdf_extractor2_spark.streaming.latest_version import stream_latest_page_version


def test_stream_latest_version_matches_batch(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    base = spark.read.parquet(f"{sf}/documents.parquet")
    # batch 1: the HIGH doc_ids (newest captures); batch 2: the low ones —
    # urls collide across the split (doc_id ≡ mod 175), so the second
    # batch delivers OLDER captures of urls whose state already holds a
    # newer one, exercising the keep-newest merge rather than last-write
    first = base.where(F.col("doc_id") >= 175)
    second = base.where(F.col("doc_id") < 175)

    grow = str(tmp_path / "grow")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first.write.mode("overwrite").parquet(grow)
    q = stream_latest_page_version(spark, grow, ckpt, out)
    q.awaitTermination(180)
    second.write.mode("append").parquet(grow)
    q = stream_latest_page_version(spark, grow, ckpt, out)
    q.awaitTermination(180)

    latest = (
        spark.read.parquet(out)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("url").orderBy(F.desc("batch_id"))
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "url", "n_versions", "latest_warc_epoch",
            "latest_doc_id", "latest_n_chars",
        )
    )
    batch = latest_page_version(spark, sf).select(
        "url", "n_versions", "latest_warc_epoch",
        "latest_doc_id", "latest_n_chars",
    )
    a = sorted(tuple(r) for r in latest.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert a == b and a

    # the collision construction must actually produce multi-version urls
    assert any(r[1] > 1 for r in b)
