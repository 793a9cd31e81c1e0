"""SparkSession factory.

Centralizes every scale-relevant config so tests, the benchmark and the
``spark-submit`` job share one tuning surface:

* AQE on (runtime coalescing + skew handling);
* Arrow on, with a bounded ``maxRecordsPerBatch`` because the ``html``
  payload column is binary-heavy — batch memory ≈ batch_rows × avg payload
  (SURVEY.md §4 "Spill/memory");
* ``PYTHONHASHSEED=0`` pinned on python workers so the kernel's
  ``list(set(...))`` orderings match driver-side oracle goldens
  (SURVEY.md §1.4);
* UTC session timezone for deterministic timestamp round-trips.

On a real multi-executor cluster the same builder is used by
``plans/submit.py``; only ``master`` and memory sizing differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_ARROW_BATCH_ROWS = 512


def get_spark(
    app_name: str = "pdf-extractor2-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = DEFAULT_ARROW_BATCH_ROWS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows)
        )
        # the extraction kernel costs ~1 ms per ~4 KB document — CPU per
        # byte is ~10^4x a normal scan, so input splits must be small or
        # a shuffle-free scan→mapInPandas plan starves the executors
        # (128 MB default ⇒ a 190 MB corpus = 3 tasks on 32 cores)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.executorEnv.PYTHONHASHSEED", "0")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PEX2_DRIVER_MEM", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
