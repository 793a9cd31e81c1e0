"""Custom stateful streaming operator #2: incremental exact dedup.

The training-data form of streaming state: as documents arrive in
micro-batches, keep per content-digest state (lowest doc_id seen, total
occurrences) so downstream writers can drop duplicates on ingest
instead of re-scanning the corpus.  Same ``applyInPandasWithState``
shape as the sessionizer (streaming/stateful.py); the converged state
per digest is provably identical to the batch aggregate
``groupBy(md5(text)).agg(min(doc_id), count(*))`` no matter how the
input is split across micro-batches (min and count are both
merge-associative) — pinned by tests/test_dedup_streaming.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("digest", T.StringType()),
    T.StructField("kept_doc_id", T.LongType()),
    T.StructField("n_seen", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("kept_doc_id", T.LongType()),
    T.StructField("n_seen", T.LongType()),
])


def _dedup(key, pdf_iter, state: GroupState):
    import pandas as pd

    (digest,) = key
    kept, n_seen = state.get if state.exists else (None, 0)

    # fold Arrow chunk by chunk — a hot digest (think: the empty page,
    # a boilerplate error page) can dominate a backlog batch, and its
    # group substream must pass through constant memory (same
    # discipline as streaming/heavy_hitters.py)
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        batch_min = int(pdf["doc_id"].min())
        kept = batch_min if kept is None else min(int(kept), batch_min)
        n_seen = int(n_seen) + len(pdf)

    state.update((kept, n_seen))
    yield pd.DataFrame([{"digest": digest, "kept_doc_id": kept, "n_seen": n_seen}])


def stream_exact_dedup(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    available_now: bool = True,
):
    """readStream(documents) → digest → per-digest stateful dedup →
    parquet (update rows tagged with batch_id; latest row per digest is
    the converged state)."""
    docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(input_path)
        .select("doc_id", F.md5(F.col("text").cast("binary")).alias("digest"))
    )
    deduped = docs.groupBy("digest").applyInPandasWithState(
        _dedup,
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
        deduped.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
