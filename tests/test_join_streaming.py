"""Stream-stream interval-join parity: the converged append-mode output
must equal the batch interval join over the same events, including a
(view, purchase) pair delivered in DIFFERENT micro-batches (the
buffered-state cross-batch match) and an outside-horizon pair that must
not join."""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractor2_spark.streaming.join_stream import (
    batch_view_purchase_join,
    stream_view_purchase_join,
)


def _events(path, rows):
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([float(r[0]) for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(table, path)


def test_stream_join_matches_batch(spark, tmp_path):
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)
    # event times stay within the 1h watermark allowance across batches:
    # batch 1's max event time is t2 → watermark t1, so batch-2 events at
    # ≥ t1:30 are on-time and batch-1 views (expiring at watermark >
    # view_ts + 2h) are still buffered for the cross-batch match
    batch1 = [
        (1, t(0), 1, "view"),
        (2, t(1), 1, "purchase"),      # joins with view 1 (+1h ≤ 2h)
        (3, t(0), 2, "view"),
        (4, t(0, 30), 3, "purchase"),  # no view for user 3 → no join
        (6, t(2), 9, "view"),          # watermark driver (max ts t2)
    ]
    batch2 = [
        (10, t(1, 30), 1, "purchase"), # CROSS-batch: joins view 1 from batch 1
        (8, t(2), 4, "view"),
        (9, t(3), 4, "purchase"),      # same-batch join in batch 2
        (5, t(4), 2, "purchase"),      # +4h after view 3 > horizon → NO join
    ]
    grow = str(tmp_path / "grow")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    import os

    os.makedirs(grow, exist_ok=True)
    _events(f"{grow}/b1.parquet", batch1)
    q = stream_view_purchase_join(spark, grow, ckpt, out)
    q.awaitTermination(180)
    _events(f"{grow}/b2.parquet", batch2)
    q = stream_view_purchase_join(spark, grow, ckpt, out)
    q.awaitTermination(180)
    # a final watermark-advance run (inner-join matches emit eagerly;
    # this just exercises state expiry before the comparison)
    _events(f"{grow}/b3.parquet", [(13, t(23), 9, "view")])
    q = stream_view_purchase_join(spark, grow, ckpt, out)
    q.awaitTermination(180)

    sf = str(tmp_path)
    _events(f"{tmp_path}/events.parquet", batch1 + batch2 +
            [(13, t(23), 9, "view")])
    want = sorted(
        tuple(r) for r in batch_view_purchase_join(spark, sf).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == want and got

    pairs = {(r[1], r[2]) for r in got}  # (view_id, purchase_id)
    assert (1, 2) in pairs          # in-horizon same-batch
    assert (1, 10) in pairs         # cross-micro-batch buffered match
    assert (8, 9) in pairs          # batch-2 local match
    assert not any(p == 5 for _, p in pairs)   # outside horizon
    assert not any(p == 4 for _, p in pairs)   # no matching view
