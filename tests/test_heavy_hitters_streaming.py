"""Streaming heavy-hitters parity: with per-shard vocabulary within the
Misra-Gries capacity the converged per-shard state equals the batch
token counts for any micro-batch split; over capacity, the classical MG
survival guarantee holds (pure-python unit test)."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pdf_extractor2_spark.streaming.heavy_hitters import (
    MG_CAPACITY,
    _mg_update,
    stream_heavy_hitters,
)


def _write_docs(path, docs, start_id=0):
    table = pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["web"] * len(docs), pa.string()),
        "n_chars": pa.array([len(d) for d in docs], pa.int64()),
    })
    pq.write_table(table, path)


def test_stream_heavy_hitters_matches_batch(spark, tmp_path):
    rng = random.Random(23)
    vocab = [f"tok{i:03d}" for i in range(100)]  # ~12 tokens/shard << 64
    docs_a = [" ".join(rng.choices(vocab, k=30)) for _ in range(40)]
    docs_b = [" ".join(rng.choices(vocab, k=30)) for _ in range(40)]

    grow = tmp_path / "grow"
    grow.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(str(grow / "a.parquet"), docs_a)
    q = stream_heavy_hitters(spark, str(grow), ckpt, out)
    q.awaitTermination(180)
    _write_docs(str(grow / "b.parquet"), docs_b, start_id=1000)
    q = stream_heavy_hitters(spark, str(grow), ckpt, out)
    q.awaitTermination(180)

    # the converged summary is the ROW SET of each shard's latest batch
    # (per-(shard, token) latest would resurrect tokens evicted from an
    # over-capacity MG table — stale rows from earlier batches)
    all_rows = spark.read.parquet(out)
    last = all_rows.groupBy("shard").agg(F.max("batch_id").alias("batch_id"))
    latest_batch = all_rows.join(last, ["shard", "batch_id"])
    got = {
        (r["token"]): r["mg_count"]
        for r in latest_batch.select("token", "mg_count").collect()
    }

    batch = spark.read.parquet(str(grow))
    want = {
        r["token"]: r["n"]
        for r in batch.select(F.explode(F.expr("split(text, ' ')")).alias("token"))
        .where(F.length("token") > 1)
        .groupBy("token").agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    # bounded state: no shard may exceed the MG capacity
    per_shard = {
        r["shard"]: r["n"]
        for r in latest_batch.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= MG_CAPACITY for n in per_shard.values()), per_shard


def test_mg_survival_guarantee():
    """A token with count > stream_len/capacity must survive an
    over-capacity Misra-Gries summary (fold order arbitrary)."""
    rng = random.Random(5)
    stream = ["hh"] * 500 + [f"noise{i}" for i in range(1000)]
    rng.shuffle(stream)
    counters: dict = {}
    capacity = 16  # 1001 distinct tokens >> capacity
    from collections import Counter

    for token, c in sorted(Counter(stream).items()):
        _mg_update(counters, token, c, capacity)
    assert "hh" in counters  # 500 > 1500/16 = 93.75 -> guaranteed
    # capacity is respected throughout
    assert len(counters) <= capacity


def test_mg_fold_is_arrow_chunking_invariant():
    """The two-phase batch fold (exact per-batch totals across Arrow
    chunks, then ONE sorted MG fold) must yield the identical counter
    table no matter where the micro-batch happens to be split into
    chunks — including the over-capacity regime, where a per-chunk MG
    fold would diverge (a token straddling two chunks folds twice with
    partial counts and triggers different decrement rounds)."""
    import pandas as pd

    from pdf_extractor2_spark.streaming import heavy_hitters as hh

    rng = random.Random(11)
    rows = ["hot"] * 300 + [f"t{i % 200}" for i in range(2000)]  # 201 > 64
    rng.shuffle(rows)

    class FakeState:
        def __init__(self):
            self.exists = False
            self.stored = None

        def update(self, v):
            self.stored = v

    def run(chunk_sizes):
        chunks, i = [], 0
        for n in chunk_sizes:
            chunks.append(pd.DataFrame({"token": rows[i:i + n]}))
            i += n
        assert i == len(rows)
        state = FakeState()
        out = list(hh._heavy((0,), iter(chunks), state))
        return state.stored, sorted(
            map(tuple, out[0][["token", "mg_count"]].itertuples(index=False))
        )

    whole = run([len(rows)])
    halves = run([len(rows) // 2, len(rows) - len(rows) // 2])
    ragged = run([1, 7, 500, len(rows) - 508])
    assert whole == halves == ragged
    assert len(whole[0][0]) <= MG_CAPACITY
