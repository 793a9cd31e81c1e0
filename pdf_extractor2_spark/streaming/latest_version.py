"""Custom stateful streaming operator #4: incremental recrawl dedup.

Streaming twin of ``operators.webcorpus.latest_page_version``: as page
captures arrive in micro-batches, keep per-url state (newest capture's
epoch + payload columns, total versions seen) so downstream consumers
always read the freshest snapshot of every url without re-scanning the
corpus.  This is the ingest-side shape of Common-Crawl consumption —
the batch operator is the backfill, this is the tail.

State is CONSTANT per url (one epoch, one doc_id, one length, one
count) regardless of how often the url is recrawled, and the fold is
merge-associative (max-by-epoch and count both are), so the converged
state equals the batch aggregate for ANY split of the input across
micro-batches — pinned by tests/test_latest_version_streaming.py.

Arrow chunks are folded incrementally (never pd.concat of the whole
micro-batch): with availableNow and no file cap the first batch is the
entire backlog, and a hot url's group substream must stream through
constant memory, same discipline as streaming/heavy_hitters.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pdf_extractor2_spark.operators.webcorpus import _URL_EXPR, _WARC_EXPR

OUTPUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("n_versions", T.LongType()),
    T.StructField("latest_warc_epoch", T.LongType()),
    T.StructField("latest_doc_id", T.LongType()),
    T.StructField("latest_n_chars", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n_versions", T.LongType()),
    T.StructField("latest_warc_epoch", T.LongType()),
    T.StructField("latest_doc_id", T.LongType()),
    T.StructField("latest_n_chars", T.LongType()),
])


def _latest(key, pdf_iter, state: GroupState):
    import pandas as pd

    (url,) = key
    if state.exists:
        n, ep, did, nch = state.get
        n, ep, did, nch = int(n), int(ep), int(did), int(nch)
    else:
        n, ep, did, nch = 0, -1, -1, -1

    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        i = int(pdf["warc_epoch"].idxmax())
        if int(pdf["warc_epoch"].loc[i]) > ep:
            ep = int(pdf["warc_epoch"].loc[i])
            did = int(pdf["doc_id"].loc[i])
            nch = int(pdf["n_chars"].loc[i])

    state.update((n, ep, did, nch))
    yield pd.DataFrame([
        {
            "url": url,
            "n_versions": n,
            "latest_warc_epoch": ep,
            "latest_doc_id": did,
            "latest_n_chars": nch,
        }
    ])


def stream_latest_page_version(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    available_now: bool = True,
):
    """readStream(documents) → derived (url, warc_epoch) → per-url
    stateful keep-latest → parquet (update rows tagged with batch_id;
    latest row per url is the converged state)."""
    pages = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(input_path)
        .select(
            "doc_id",
            "n_chars",
            F.expr(_URL_EXPR).alias("url"),
            F.expr(_WARC_EXPR).alias("warc_epoch"),
        )
    )
    latest = pages.groupBy("url").applyInPandasWithState(
        _latest,
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
        latest.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
