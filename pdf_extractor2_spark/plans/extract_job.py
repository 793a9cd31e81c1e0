"""Corpus-level extraction pipeline (SURVEY.md §3 "Spark rebuild").

    spark.read.parquet(pages)                      # Iceberg in production
      .select("url", "html")                       # column-pruned scan
      .withColumn("bucket", pmod(xxhash64(url, SALT), P))
      .repartition(P, "bucket")       # OPT-IN (resume lineage only —
      .mapInPandas(extraction_kernel, RESULT_SCHEMA)   # default is
                                      # shuffle-free scan → kernel)

One Arrow batch in → one result row per document out; per-document
failures become failure *rows*, never task failures (app.py:180-186
analogue).  The metrics side table is a Catalyst-native aggregation over
the result set, one row per bucket (north_rule: per-partition lineage +
success/failure metrics); resume anti-joins completed buckets.

Scale notes (100 TB / 10^12 docs):
  * bucket count P is the unit of resume + skew spread; hash(url) with a
    fixed salt spreads hot hosts across buckets deterministically (the
    salt is a pure function of url — restart-stable);
  * the kernel is CPU-bound Python: throughput scales with executor
    cores as long as Arrow batches amortize IPC (maxRecordsPerBatch is
    bounded in session.py because html payloads are KB-sized);
  * no driver-side collection anywhere; the only shuffle is the single
    repartition by bucket (needed for deterministic resume lineage —
    without resume, mapInPandas runs shuffle-free on scan partitions).
"""

from __future__ import annotations

import json
import time
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.document import CandidateTable, DocumentIR, parse_document, result_with_raw_json
from ..sources.html_extract import extract_html

HASH_SALT = 42  # fixed xxhash64 seed: deterministic across restarts
MAX_PAYLOAD_BYTES = 64 * 1024 * 1024  # document-size skew guard (failure row)

RESULT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("bucket", T.IntegerType(), True),
    T.StructField("success", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
    T.StructField("payload_kind", T.StringType(), True),
    T.StructField("main_text", T.StringType(), True),
    T.StructField("spans_json", T.StringType(), True),
    T.StructField("raw_json", T.StringType(), True),
    T.StructField("n_contacts", T.IntegerType(), True),
    T.StructField("n_projects", T.IntegerType(), True),
    T.StructField("n_tenders", T.IntegerType(), True),
    T.StructField("n_tables", T.IntegerType(), True),
    T.StructField("avg_confidence", T.DoubleType(), True),
    T.StructField("methods", T.ArrayType(T.StringType()), True),
    T.StructField("kernel_ms", T.DoubleType(), True),
])

METRICS_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("bucket", T.IntegerType(), True),
    T.StructField("n_docs", T.LongType(), True),
    T.StructField("n_success", T.LongType(), True),
    T.StructField("n_failure", T.LongType(), True),
    T.StructField("first_error", T.StringType(), True),
    T.StructField("kernel_ms", T.DoubleType(), True),
])


def payload_to_ir(payload: bytes | None) -> tuple[DocumentIR, list[dict], str]:
    """Front-end dispatch: sniff payload bytes, parse, build the kernel IR.

    Returns (ir, spans, payload_kind). Raises on unusable payloads — the
    batch loop converts exceptions into failure rows.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    if len(payload) > MAX_PAYLOAD_BYTES:
        # one pathological page must not stall a task at 10^12-doc scale
        raise ValueError(f"payload too large ({len(payload)} bytes)")

    if payload[:2] == b"\x1f\x8b":
        # gzip-wrapped payload (common in WARC-derived tables); bounded
        # like FlateDecode — a bomb becomes a failure row
        import zlib

        d = zlib.decompressobj(wbits=31)
        payload = d.decompress(payload, MAX_PAYLOAD_BYTES)
        if d.unconsumed_tail:
            raise ValueError("gzip payload exceeds bound (decompression bomb?)")
        if not d.eof:
            # stream did not terminate cleanly — a truncated gzip payload
            # must become a failure row, not a silently partial document
            raise ValueError("truncated gzip payload")
        if len(payload) == 0:
            raise ValueError("empty gzip payload")

    if payload[:5] == b"%PDF-":
        from ..sources.pdf_reader import extract_pdf

        parsed = extract_pdf(payload)
        ir = DocumentIR(
            page_texts=parsed.page_texts,
            lattice_tables=[
                CandidateTable(grid=g, page=p, method="lattice", accuracy=a)
                for g, p, a in parsed.lattice_tables
            ],
            stream_tables_by_config=[
                [
                    CandidateTable(grid=g, page=p, method="stream", accuracy=a)
                    for g, p, a in config_tables
                ]
                for config_tables in parsed.stream_tables_by_config
            ],
        )
        return ir, parsed.spans, "pdf"

    page = extract_html(payload)
    ir = DocumentIR(
        page_texts=[page.main_text],
        lattice_tables=[
            CandidateTable(grid=grid, page=1, method="lattice", accuracy=100.0)
            for grid in page.tables
            if grid and len(grid) > 2
        ],
    )
    return ir, page.spans, "html"


def _extract_one(url: str, payload, bucket) -> dict:
    t0 = time.perf_counter()
    try:
        payload_bytes = bytes(payload) if payload is not None else None
        ir, spans, kind = payload_to_ir(payload_bytes)
        result = parse_document(ir)
        enveloped = result_with_raw_json(result, url)
        return {
            "url": url,
            "bucket": bucket,
            "success": True,
            "error": None,
            "payload_kind": kind,
            "main_text": "\n\f\n".join(ir.page_texts),
            "spans_json": json.dumps(spans, ensure_ascii=False),
            "raw_json": enveloped["raw_json"],
            "n_contacts": result["summary"]["contacts"],
            "n_projects": result["summary"]["projects"],
            "n_tenders": result["summary"]["tenders"],
            "n_tables": result["quality"]["tables_processed"],
            "avg_confidence": result["quality"]["avg_confidence"],
            "methods": result["quality"]["extraction_methods"],
            "kernel_ms": (time.perf_counter() - t0) * 1000.0,
        }
    except Exception as exc:  # failure row, never a task failure
        return {
            "url": url,
            "bucket": bucket,
            "success": False,
            "error": f"{type(exc).__name__}: {exc}"[:500],
            "payload_kind": None,
            "main_text": None,
            "spans_json": None,
            "raw_json": None,
            "n_contacts": 0,
            "n_projects": 0,
            "n_tenders": 0,
            "n_tables": 0,
            "avg_confidence": None,
            "methods": None,
            "kernel_ms": (time.perf_counter() - t0) * 1000.0,
        }


def extraction_kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch of pages → batch of result rows."""
    for pdf in batches:
        buckets = pdf["bucket"] if "bucket" in pdf.columns else pd.Series([None] * len(pdf))
        rows = [
            _extract_one(url, payload, bucket)
            for url, payload, bucket in zip(pdf["url"], pdf["html"], buckets)
        ]
        yield pd.DataFrame(rows)


def with_bucket(pages: DataFrame, num_buckets: int) -> DataFrame:
    """Deterministic bucket assignment: pmod(xxhash64(url, SALT), P).

    xxhash64 of the full url spreads any single hot host across all
    buckets (url paths differ), which is the salting the north_rule asks
    for; the fixed seed keeps the assignment restart-stable.
    """
    return pages.withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col("url"), F.lit(HASH_SALT)), F.lit(num_buckets)).cast("int"),
    )


def run_extract(
    pages: DataFrame,
    num_buckets: int = 64,
    repartition: bool = False,
) -> DataFrame:
    """The extraction plan: prune columns → bucket → (optional shuffle) →
    vectorized kernel.  Returns the results DataFrame (lazy).

    Round-6 default flip (guide §2.4 "remove shuffles outright"):
    ``repartition=False`` — the kernel runs straight on the scan splits,
    so the html payload is never shuffled at all.  The bucket column is
    still computed (deterministic url-hash lineage for consumers that
    group by it); only the physical exchange is gone.  The shuffle is
    needed ONLY when bucket-aligned task lineage matters (resume:
    ``run_resumable`` repartitions explicitly).  Skew: scan splits are
    bounded by ``spark.sql.files.maxPartitionBytes`` (8 MB in
    session.py), so a corpus yields ≥ tens of splits per GB and the
    pdf/html cost mix balances by LLN within each multi-thousand-doc
    split.  Measured best-of-4 at 200k docs / local[32]: 14.6s vs 16.1s
    with the shuffle — identical results (raw_json_bytes invariant)."""
    pruned = pages.select("url", "html")
    bucketed = with_bucket(pruned, num_buckets)
    if repartition:
        bucketed = bucketed.repartition(num_buckets, "bucket")
    return bucketed.mapInPandas(extraction_kernel, RESULT_SCHEMA)


def metrics_rollup(results: DataFrame, run_id: str) -> DataFrame:
    """Per-bucket lineage/metrics side table — a Catalyst-native partial+
    final hash aggregation (SURVEY.md §2.5 A3/A4)."""
    return (
        results.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("success").cast("long")).alias("n_success"),
            F.sum((~F.col("success")).cast("long")).alias("n_failure"),
            F.min("error").alias("first_error"),  # min ignores nulls: lexicographically first error
            F.sum("kernel_ms").alias("kernel_ms"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "bucket", "n_docs", "n_success", "n_failure", "first_error", "kernel_ms",
        )
    )


# ---------------------------------------------------------------------------
# resumable job: results partitioned by bucket + completed-bucket anti-join
# ---------------------------------------------------------------------------

def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    metrics_path: str,
    run_id: str,
    num_buckets: int = 64,
) -> None:
    """Idempotent bucket-at-a-time job (SURVEY.md §4 "Resumability").

    Completed buckets are recorded in the metrics table; on restart the
    pending set = all buckets ANTI JOIN completed buckets (broadcast —
    the bucket list is tiny).  Result files are written under
    ``bucket=<k>/`` partitions, so a re-run of a half-finished bucket
    overwrites only that bucket's directory (dynamic partition overwrite).
    """
    completed: set[int] = set()
    try:
        prior = spark.read.parquet(metrics_path).where(F.col("run_id") == run_id)
        completed = {r["bucket"] for r in prior.select("bucket").distinct().collect()}
    except Exception:
        pass  # no metrics yet — fresh run

    bucketed = with_bucket(pages.select("url", "html"), num_buckets)
    if completed:
        bucketed = bucketed.where(~F.col("bucket").isin(sorted(completed)))

    results = bucketed.repartition(num_buckets, "bucket").mapInPandas(
        extraction_kernel, RESULT_SCHEMA
    )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    results.write.mode("overwrite").partitionBy("bucket").parquet(output_path)

    done = spark.read.parquet(output_path)
    metrics_rollup(done, run_id).write.mode("append").parquet(metrics_path)


def list_input_files_iceberg(spark: SparkSession, table: str) -> list[str]:
    """Input data files from the Iceberg ``files`` snapshot-metadata
    table — the production branch of ``list_input_files``: one metadata
    query (`SELECT file_path FROM <t>.files`), zero data bytes read, and
    the file set is pinned to the current snapshot (consistent resume
    even while writers append).  Requires an Iceberg catalog on the
    session; select it with ``PEX2_ICEBERG_TABLE`` (see
    ``run_resumable_by_file``)."""
    rows = spark.sql(f"SELECT file_path FROM {table}.files").collect()
    return sorted(r["file_path"] for r in rows)


def list_input_files(spark: SparkSession, input_path: str) -> list[str]:
    """Input data files from storage METADATA (Hadoop FileSystem
    listStatus) — never a row scan.  In production the Iceberg branch
    (``list_input_files_iceberg``) replaces this; the local analogue is
    a directory listing: both are O(#files) metadata operations that
    touch zero data bytes."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(input_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return sorted(
        st.getPath().toString()
        for st in fs.listStatus(jpath)
        if st.isFile() and st.getPath().getName().endswith(".parquet")
    )


def file_lineage_pages(spark: SparkSession, pending: list[str],
                       manifest: DataFrame) -> DataFrame:
    """Pages of the pending files with their lineage bucket attached via
    a broadcast manifest join — the plan carries NO per-file literals,
    so its size is independent of file count (SURVEY §9: 10^6-10^7 data
    files).  The broadcast hash join keeps the plan shuffle-free."""
    return (
        spark.read.parquet(*pending)
        .select(
            "url", "html",
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file_name"),
        )
        .join(F.broadcast(manifest), "file_name")
        .select("url", "html", "bucket")
    )


def run_resumable_by_file(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    metrics_path: str,
    run_id: str,
) -> None:
    """Shuffle-free resumable job: lineage is keyed by *input file*.

    The unit of work is one input parquet file (an Iceberg data file in
    production): the file list comes from snapshot/storage metadata
    (``list_input_files``), the restart set is a set-difference on file
    names — pure metadata — and the extraction plan is scan → broadcast
    manifest join → mapInPandas with NO shuffle at all.  File→bucket ids
    travel as a small manifest DataFrame (at 10^7 files: read the
    Iceberg ``files`` table instead of ``createDataFrame``), never as
    ``create_map`` literals, so plan size is independent of file count.
    This is the preferred production shape; the bucket-shuffle variant
    (run_resumable) remains for url-hash-keyed lineage.

    Idempotence: results are written under ``bucket=<file_id>/``
    partitions (dynamic overwrite), so re-running a half-finished file
    replaces only that file's partition.

    Feature flag: when ``PEX2_ICEBERG_TABLE`` names an Iceberg table,
    the file list comes from that table's ``files`` snapshot-metadata
    table instead of a filesystem listing (the production face — the
    parquet listing is the sandbox stand-in, same O(#files) metadata
    contract).
    """
    import os
    import posixpath

    iceberg_table = os.environ.get("PEX2_ICEBERG_TABLE")
    if iceberg_table:
        all_files = list_input_files_iceberg(spark, iceberg_table)
    else:
        all_files = list_input_files(spark, input_path)
    file_ids = {posixpath.basename(p): i for i, p in enumerate(all_files)}

    completed: set[str] = set()
    try:
        prior = spark.read.parquet(metrics_path).where(F.col("run_id") == run_id)
        completed = {r["file_name"] for r in prior.select("file_name").collect()}
    except Exception:
        pass

    pending = [p for p in all_files if posixpath.basename(p) not in completed]
    if not pending:
        return

    manifest = spark.createDataFrame(
        [(n, i) for n, i in file_ids.items() if n not in completed],
        "file_name string, bucket int",
    )

    results = file_lineage_pages(spark, pending, manifest).mapInPandas(
        extraction_kernel, RESULT_SCHEMA
    )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    results.write.mode("overwrite").partitionBy("bucket").parquet(output_path)

    # metrics only for the buckets finished this run: the manifest join is
    # simultaneously the pending filter and the bucket→file_name mapping
    done = spark.read.parquet(output_path).join(
        F.broadcast(manifest.select("bucket")), "bucket"
    )
    metrics_rollup(done, run_id).join(F.broadcast(manifest), "bucket").select(
        "run_id", "bucket", "n_docs", "n_success", "n_failure",
        "first_error", "kernel_ms", "file_name",
    ).write.mode("append").parquet(metrics_path)
