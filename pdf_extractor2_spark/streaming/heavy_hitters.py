"""Custom stateful streaming operator #3: heavy hitters on ingest.

Streaming token heavy-hitters via per-shard Misra-Gries summaries —
the bounded-state sketch a pipeline runs on the ingest stream to track
vocabulary heavy hitters without re-scanning the corpus.  Tokens are
hash-sharded (``hash(token) % n_shards``) so each
``applyInPandasWithState`` key owns a DISJOINT token subset; the
per-shard state is a Misra-Gries counter table capped at ``capacity``
entries — constant-size state regardless of stream length, the same
guarantee as the sessionizer's 2-field state but for an aggregation
whose naive state (one counter per distinct token) would grow with the
vocabulary.

Exactness property (what the parity test pins): Misra-Gries is exact
whenever a shard's distinct-token count stays ≤ capacity, so with
capacity ≥ per-shard vocabulary the converged state equals the batch
``groupBy(token).count()`` for ANY micro-batch split (per-token counts
are merge-associative; shards partition the token space).  Over-budget
vocabularies degrade gracefully: any token with true count >
stream_len/capacity is guaranteed to survive, the classical MG bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MG_CAPACITY = 64
N_SHARDS = 8

OUTPUT_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("token", T.StringType()),
    T.StructField("mg_count", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("tokens", T.ArrayType(T.StringType())),
    T.StructField("counts", T.ArrayType(T.LongType())),
])


def _mg_update(counters: dict, token: str, c: int, capacity: int) -> None:
    """Batched Misra-Gries: fold c occurrences of token into the table,
    decrementing the whole table by the bottleneck when it is full."""
    if token in counters:
        counters[token] += c
        return
    while c > 0:
        if len(counters) < capacity:
            counters[token] = c
            return
        m = min(counters.values())
        d = min(c, m)
        for t in list(counters):
            counters[t] -= d
            if counters[t] <= 0:
                del counters[t]
        c -= d
        if token in counters:  # cannot happen, but keep the loop safe
            counters[token] += c
            return


def _heavy(key, pdf_iter, state: GroupState):
    import pandas as pd

    (shard,) = key
    if state.exists:
        tokens, counts = state.get
        counters = dict(zip(list(tokens), [int(c) for c in counts]))
    else:
        counters = {}

    # Two-phase fold: (1) exact per-token counts for THIS micro-batch,
    # accumulated Arrow chunk by chunk — never pd.concat of the whole
    # batch (with availableNow and no maxFilesPerTrigger the first
    # batch is the entire backlog; memory here is O(batch vocabulary),
    # strictly below the O(rows) a concat would cost); (2) ONE
    # token-sorted MG fold of those totals.  Folding MG per chunk
    # instead would make over-capacity results depend on where Arrow
    # happens to split the substream (a token straddling two chunks
    # folds twice with partial counts and triggers different decrement
    # rounds) — batch totals make the result a function of the DATA,
    # invariant to arrow.maxRecordsPerBatch and row layout.
    batch_counts: dict[str, int] = {}
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        for token, c in pdf.groupby("token").size().items():
            t = str(token)
            batch_counts[t] = batch_counts.get(t, 0) + int(c)
    for token, c in sorted(batch_counts.items()):
        _mg_update(counters, token, c, MG_CAPACITY)

    items = sorted(counters.items())
    state.update((
        [t for t, _ in items],
        [int(c) for _, c in items],
    ))
    yield pd.DataFrame(
        [{"shard": int(shard), "token": t, "mg_count": int(c)} for t, c in items],
        columns=["shard", "token", "mg_count"],
    )


def stream_heavy_hitters(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    available_now: bool = True,
):
    """readStream(documents) → explode tokens → hash shard → per-shard
    Misra-Gries state → parquet (update rows tagged with batch_id; the
    latest row set per shard is the converged summary)."""
    toks = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(input_path)
        .select(F.explode(F.expr("split(text, ' ')")).alias("token"))
        .where(F.length("token") > 1)
        .select(
            "token",
            F.pmod(F.xxhash64("token"), F.lit(N_SHARDS)).cast("int").alias("shard"),
        )
    )
    summaries = toks.groupBy("shard").applyInPandasWithState(
        _heavy,
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
        summaries.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
