"""Stop-shingle document-frequency cap (prefix filtering).

At web scale a boilerplate shingle shared by df documents lands df rows
on ONE shuffle key of the inverted-index self-join and fans out O(df²)
candidate pairs — the classic skewed-key killer.  The cap drops shingles
with df > MAX_SHINGLE_DF from the similarity universe before the join;
these tests prove the bound with an injected hot shingle and that the
capped semantics still match the DuckDB oracle exactly.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pdf_extractor2_spark.operators import dedup

N_HOT = 150  # docs sharing one boilerplate shingle; > MAX_SHINGLE_DF (100)


@pytest.fixture(scope="module")
def hot_dir(tmp_path_factory):
    """documents.parquet where N_HOT docs share exactly one (hot) shingle
    and two extra docs are genuine near-duplicates of each other."""
    d = tmp_path_factory.mktemp("hotshingle")
    rows = [
        # every doc starts with the same 3 words -> one shared shingle
        # with df = N_HOT; the remaining shingles are doc-unique
        (i, f"hot stop word u{i} v{i} w{i} x{i}")
        for i in range(N_HOT)
    ] + [
        # a real near-dup pair sharing most (rare) shingles
        (1000, "alpha beta gamma delta epsilon zeta eta theta"),
        (1001, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def _candidates(ex) -> int:
    a, b = ex.alias("a"), ex.alias("b")
    return a.join(
        b, (F.col("a.sid") == F.col("b.sid")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).count()


def test_hot_shingle_candidates_bounded(spark, hot_dir):
    raw = dedup._with_shingle_ids(spark, hot_dir)
    uncapped = _candidates(raw)
    capped = _candidates(dedup._capped(raw, dedup.MAX_SHINGLE_DF))
    # without the cap the single hot shingle alone contributes C(150,2)
    assert uncapped >= N_HOT * (N_HOT - 1) // 2
    # with the cap only the genuine near-dup pair's rare shingles remain
    assert capped <= 10, capped
    # the df threshold itself is respected: a shingle at df == cap survives
    survivors = dedup._capped(raw, N_HOT).select("sid").distinct().count()
    assert survivors > dedup._capped(raw, dedup.MAX_SHINGLE_DF).select("sid").distinct().count()


def test_capped_jaccard_pairs_drop_hot_only(spark, hot_dir):
    got = dedup.jaccard_pairs(spark, hot_dir, threshold=0.5).collect()
    # the hot-prefix docs share nothing after the cap -> only the real pair
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(1000, 1001)]


def test_capped_jaccard_matches_duckdb(spark, hot_dir):
    sdf = dedup.jaccard_pairs(spark, hot_dir, threshold=0.1)
    srows = sorted((r["doc_a"], r["doc_b"], round(r["jaccard"], 9)) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{hot_dir}/documents.parquet')"
    )
    drows = sorted(
        (a, b, round(j, 9))
        for a, b, j in con.execute(dedup.jaccard_pairs_sql(threshold=0.1)).fetchall()
    )
    assert srows == drows and srows  # non-empty and identical


def test_cap_anti_join_broadcasts(spark, hot_dir):
    """The hot-shingle set is tiny; dropping it must be a broadcast
    anti-join — the big shingle relation never reshuffles for the cap."""
    plan = (
        dedup._capped(dedup._with_shingle_ids(spark, hot_dir), dedup.MAX_SHINGLE_DF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
