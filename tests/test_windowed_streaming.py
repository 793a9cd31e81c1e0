"""Watermarked event-time windows: streaming append output must cover
every window the watermark has passed, each matching the batch
aggregation exactly; only the tail windows (still open at drain time)
may be withheld."""

from __future__ import annotations

from pdf_extractor2_spark.streaming.windowed import (
    batch_windowed_counts,
    stream_windowed_counts,
)


def test_windowed_stream_matches_batch(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "out")

    # the file stream source wants a directory of just-events files
    inp = str(tmp_path / "events_in")
    spark.read.parquet(f"{sf}/events.parquet").write.parquet(inp)

    q = stream_windowed_counts(
        spark,
        input_path=inp,
        checkpoint_path=str(tmp_path / "ckpt"),
        output_path=out,
    )
    q.awaitTermination(180)

    streamed = {
        (r["window_start"], r["window_end"], r["event_type"]):
            (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["window_start"], r["window_end"], r["event_type"]):
            (r["n_events"], r["total_value"])
        for r in batch_windowed_counts(spark, sf).collect()
    }

    # append mode withholds windows not yet passed by the watermark —
    # everything emitted must match batch exactly, and the emitted set
    # must cover all but the final watermark span (1h of 30 days)
    assert streamed, "no windows emitted"
    for key, val in streamed.items():
        assert batch[key] == val, key
    assert len(streamed) >= len(batch) - 2 * 5  # ≤2 tail windows × 5 types
