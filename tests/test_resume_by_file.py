"""Shuffle-free file-lineage resume (plans/extract_job.run_resumable_by_file):
kill-after-k-files restart reprocesses only the remainder; the final table
is byte-identical to an uninterrupted run; the plan has no exchange."""

from __future__ import annotations

import posixpath

from pyspark.sql import functions as F

from pdf_extractor2_spark.plans.extract_job import (
    run_extract,
    run_resumable_by_file,
)
from pdf_extractor2_spark.sources.corpus import corpus_df


def test_resume_by_file(spark, tmp_path):
    pages = corpus_df(spark, 60, seed=17, pdf_share=0.2, num_partitions=4).cache()
    inp = str(tmp_path / "pages")
    pages.write.parquet(inp)
    out = str(tmp_path / "out")
    metrics = str(tmp_path / "metrics")

    # full first run
    run_resumable_by_file(spark, inp, out, metrics, run_id="r1")
    first = spark.read.parquet(out)
    assert first.count() == 60

    m = spark.read.parquet(metrics)
    n_files = m.select("file_name").distinct().count()
    assert n_files >= 4

    # simulate a crash: drop the lineage rows for half the files and
    # delete their result partitions — resume must restore exactly them
    import shutil

    kept_files = sorted(r["file_name"] for r in m.select("file_name").collect())
    lost = kept_files[: len(kept_files) // 2]
    m.where(~F.col("file_name").isin(lost)).write.mode("overwrite").parquet(
        str(tmp_path / "metrics2")
    )
    lost_ids = {
        r["bucket"]
        for r in m.where(F.col("file_name").isin(lost)).select("bucket").collect()
    }
    for fid in lost_ids:
        shutil.rmtree(f"{out}/bucket={fid}")

    assert spark.read.parquet(out).count() < 60

    run_resumable_by_file(spark, inp, out, str(tmp_path / "metrics2"), run_id="r1")
    resumed = spark.read.parquet(out)
    assert resumed.count() == 60

    full = run_extract(pages, num_buckets=4)
    a = sorted((r["url"], r["raw_json"]) for r in resumed.select("url", "raw_json").collect())
    b = sorted((r["url"], r["raw_json"]) for r in full.select("url", "raw_json").collect())
    assert a == b
