"""Physical-plan assertions (SURVEY.md §4): the optimizations we rely on
at 100 TB must actually appear in the plans — column pruning reaching
the parquet scan, broadcast joins for dimensions, no stray shuffles in
the extraction pipeline, pushed filters."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    # a small real parquet pages table so scans have a file source
    from pdf_extractor2_spark.sources.corpus import corpus_df

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    corpus_df(spark, 50, seed=3, pdf_share=0.0, num_partitions=2).write.parquet(path)
    return path


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_extraction_scan_is_column_pruned(spark, sf_dir):
    """The pages scan must read only (url, html) — never warc_ts/lang/text
    (BinaryType html dominates IO; the rest would be pure waste)."""
    from pdf_extractor2_spark.plans.extract_job import run_extract

    pages = spark.read.parquet(sf_dir)
    plan = _plan(run_extract(pages, num_buckets=4))
    scan = next(s for s in plan.split("\n\n") if "ReadSchema" in s)
    assert "url" in scan and "html" in scan
    assert "warc_ts" not in scan and "lang" not in scan, scan


def test_extraction_has_single_exchange(spark, sf_dir):
    """DEFAULT is shuffle-free (round 6: the html payload is never
    shuffled — guide §2.4); the opt-in bucket repartition (resume
    lineage) is exactly one exchange."""
    from pdf_extractor2_spark.plans.extract_job import run_extract

    pages = spark.read.parquet(sf_dir)
    import re

    plan_free = _plan(run_extract(pages, num_buckets=4))
    assert len(re.findall(r"\(\d+\) Exchange", plan_free)) == 0, plan_free
    plan = _plan(run_extract(pages, num_buckets=4, repartition=True))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_dimension_joins_are_broadcast(spark):
    from pdf_extractor2_spark.plans.relational import revenue_by_nation

    plan = _plan(revenue_by_nation(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    # nation & region must be on the broadcast side (two broadcast joins)
    assert plan.count("BroadcastExchange") >= 2, plan


def test_part_filter_is_pushed(spark):
    from pdf_extractor2_spark.plans.relational import parts_by_brand

    plan = _plan(parts_by_brand(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters" in plan and "p_size" in plan, plan


def test_pricing_summary_partial_aggregation(spark):
    """Map-side combine: partial_ aggregate functions before the exchange."""
    from pdf_extractor2_spark.plans.relational import pricing_summary

    plan = _plan(pricing_summary(spark, "/root/testdata/sf0.001"))
    assert "partial_" in plan or "HashAggregate" in plan
    scan = next(s for s in plan.split("\n\n") if "ReadSchema" in s)
    # column pruning: only the 4 needed lineitem columns in the read schema
    assert "l_shipdate" not in scan, scan


def test_whole_stage_codegen_active(spark):
    from pdf_extractor2_spark.plans.relational import pricing_summary

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pricing_summary(spark, "/root/testdata/sf0.001").explain("codegen")
    # the aggregate pipeline must be inside whole-stage-codegen subtrees
    assert "WholeStageCodegen" in buf.getvalue()


def test_salted_join_equals_plain_join_and_shuffles(spark):
    """The salted join is a physical rewrite only: results identical to
    the plain join, the physical plan is a shuffle join (not broadcast)
    keyed on (key, salt)."""
    from pdf_extractor2_spark.plans.relational import salted_join_user_segments

    sf = "/root/testdata/sf0.001"
    df = salted_join_user_segments(spark, sf)
    plan = _plan(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "salt" in plan

    from pyspark.sql import functions as F

    from pdf_extractor2_spark.plans.relational import _r2

    ev = spark.read.parquet(f"{sf}/events.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    plain = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"),
             F.expr(_r2("SUM(value)")).alias("total_value"))
    )
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in plain.collect())
    assert a == b and a


def test_bloom_prefilter_prunes_but_never_changes_results(spark):
    """The hand-built Bloom prefilter must (a) keep the semi-join result
    exactly equal to the plain semi join, and (b) actually prune: with a
    selective dimension predicate, far fewer fact rows survive the probe
    than exist."""
    from pyspark.sql import functions as F

    from pdf_extractor2_spark.plans import relational
    from pdf_extractor2_spark.plans.relational import bloom_semi_join_orders

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in bloom_semi_join_orders(spark, sf, 9000.0).collect())

    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = spark.read.parquet(f"{sf}/customer.parquet").where(F.col("c_acctbal") > 9000.0)
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             F.expr(relational._r2("SUM(o_totalprice)")).alias("revenue"))
    )
    want = sorted(tuple(r) for r in plain.collect())
    assert got == want and got

    # pruning: probe survivors ≈ true matches + false positives ≪ |orders|
    n_orders = orders.count()
    n_true = orders.join(
        cust.select("c_custkey"), orders.o_custkey == cust.c_custkey, "left_semi"
    ).count()
    bf = relational._bloom_build(cust.select("c_custkey"), "c_custkey")
    n_survivors = relational._bloom_probe(orders, bf, "o_custkey").count()
    assert n_true <= n_survivors < 0.5 * n_orders, (n_true, n_survivors, n_orders)


def test_dedup_plans_have_no_cartesian_product(spark):
    """The similarity/dedup family must never degenerate into a cross
    product — candidate pairs come from inverted-index or bucket joins."""
    from pdf_extractor2_spark.operators import dedup, similarity

    for fn in (dedup.jaccard_pairs, dedup.minhash_lsh_pairs,
               similarity.embedding_near_dup_pairs):
        plan = _plan(fn(spark, "/root/testdata/sf0.001"))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def _unique_parquet_scans(plan: str) -> int:
    """Unique FileScan nodes in a formatted plan: details-section headers
    look like `(3) Scan parquet`; tree references repeat the id but put
    it AFTER the name, so this counts each physical scan node once even
    when several InMemoryTableScans expand the same cached relation."""
    import re

    return len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))


def test_minhash_lsh_scans_documents_once(spark):
    """Round-2 regression pin: the LSH query lost the shared-signature
    persist in a cache-scoping refactor and re-ran the shingle pipeline
    16× (16 FileScans of documents.parquet in ONE query — the 1.1s→10.1s
    bench regression).  The plan must contain exactly one parquet scan,
    with every other reference served from the persisted signature
    table."""
    from pdf_extractor2_spark.operators.dedup import minhash_lsh_pairs

    plan = _plan(minhash_lsh_pairs(spark, "/root/testdata/sf0.001"))
    assert "documents.parquet" in plan
    assert _unique_parquet_scans(plan) == 1, plan
    assert "InMemoryTableScan" in plan, plan


def test_embedding_near_dup_scans_embeddings_once(spark):
    """Same shape as the minhash pin: the banded hyperplane-LSH query
    references embeddings from four branches (band a/b, exact-score a/b);
    all must read the one persisted scan — at 10^9 vectors re-reading
    the vector table 16× is the difference between a pass and a re-shard."""
    from pdf_extractor2_spark.operators.similarity import embedding_near_dup_pairs

    plan = _plan(embedding_near_dup_pairs(spark, "/root/testdata/sf0.001"))
    assert "embeddings.parquet" in plan
    assert _unique_parquet_scans(plan) == 1, plan
    assert "InMemoryTableScan" in plan, plan


def test_kmv_scans_documents_once(spark):
    """The KMV sketch's distinct-hash branch feeds both the sketch leg
    and the exact leg; with the scoped persist the explode+fold+distinct
    subtree (and the file scan under it) must appear exactly once."""
    from pdf_extractor2_spark.operators.textstats import distinct_shingles_kmv

    plan = _plan(distinct_shingles_kmv(spark, "/root/testdata/sf0.001"))
    assert "documents.parquet" in plan
    assert _unique_parquet_scans(plan) == 1, plan


def test_range_join_hot_user_bounded(spark):
    """Hot-user skew guard: the range join keys on (user_id, coarse time
    bucket), so one bot user with N events fans out per-purchase to the
    events of 3 window-sized buckets, not to all N.  Checks (a) exact
    counts against a closed-form expectation on a hot-user fixture and
    (b) the physical join condition actually includes the bucket key."""
    from pyspark.sql import functions as F

    from pdf_extractor2_spark.plans.relational import _nearby_event_counts

    n, spacing, window = 2000, 100.0, 300
    ev = spark.range(n).select(
        F.lit(7).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") * spacing).alias("epoch"),
        F.when(F.col("id") % 100 == 0, "purchase")
        .otherwise("click")
        .alias("event_type"),
    )
    out = _nearby_event_counts(ev, window)

    plan = _plan(out)
    assert "tb" in plan, plan  # bucket key participates in the join

    got = {r["purchase_id"]: r["n_nearby"] for r in out.collect()}
    reach = int(window // spacing)  # events within ±window at fixed spacing
    want = {
        p: len([e for e in range(max(0, p - reach), min(n, p + reach + 1)) if e != p])
        for p in range(0, n, 100)
    }
    assert got == want, (sorted(got.items())[:3], sorted(want.items())[:3])


def test_view_purchase_join_hot_user_bounded(spark):
    """Hot-user skew guard for the batch interval join (VERDICT r3 #2):
    the join keys on (user, horizon-sized time bucket) with the purchase
    side replicated 2×, so a bot user's views meet only the purchases of
    two adjacent buckets — never the user's full history.  Checks (a)
    exact matches against a closed-form expectation on a single-hot-user
    fixture and (b) the bucket key participating in the physical join."""
    from pyspark.sql import functions as F

    from pdf_extractor2_spark.streaming.join_stream import (
        _bucketed_interval_join,
        _sides,
    )

    n, spacing, horizon = 1000, 600, 7200
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") * spacing).alias("ts"),
        F.lit(7).alias("user_id"),
        F.when(F.col("id") % 5 == 0, "purchase").otherwise("view").alias(
            "event_type"
        ),
        F.lit(1.0).alias("value"),
    )
    views, purchases = _sides(ev)
    out = _bucketed_interval_join(views, purchases, horizon)

    plan = _plan(out)
    assert "tb" in plan, plan  # bucket key participates in the join

    got = sorted((r["view_id"], r["purchase_id"]) for r in out.collect())
    reach = horizon // spacing  # purchase i matches views in [i-reach, i)
    want = sorted(
        (v, p)
        for p in range(0, n, 5)
        for v in range(max(0, p - reach), p)
        if v % 5 != 0
    )
    assert got == want and got


def test_training_corpus_filter_scans_documents_once(spark):
    """The composed filter references the quality-filtered table from
    two branches (exact-dedup aggregate + survivors join) and the
    shingle stream from three — all must read persisted scans: ONE
    FileScan of documents per query (and, since the round-5 semantic
    stage, exactly one more for embeddings — two unique scans total)."""
    from pdf_extractor2_spark.operators.dedup import training_corpus_filter

    plan = _plan(training_corpus_filter(
        spark, "/root/testdata/sf0.001", with_semdedup=False
    ))
    assert "documents.parquet" in plan
    assert _unique_parquet_scans(plan) == 1, plan

    plan = _plan(training_corpus_filter(spark, "/root/testdata/sf0.001"))
    assert "documents.parquet" in plan and "embeddings.parquet" in plan
    assert _unique_parquet_scans(plan) == 2, plan


def test_duplicate_span_stats_scans_documents_once(spark):
    from pdf_extractor2_spark.operators.dedup import duplicate_span_stats

    plan = _plan(duplicate_span_stats(spark, "/root/testdata/sf0.001"))
    assert "documents.parquet" in plan
    assert _unique_parquet_scans(plan) == 1, plan


def test_consolidated_driver_rows_scan_once(spark):
    """The round-4 fused driver rows must keep the single-scan shape of
    their source operators: doc_profile (7 per-doc ops, one persisted
    tokenize), top_tokens (global + per-lang from one persisted freq
    aggregate), host_profile (stats + quality from one persisted per-row
    projection), labeled embedding near-dup (pairs + labels + norms from
    one persisted vector scan)."""
    from pdf_extractor2_spark.operators import similarity, textstats, webcorpus

    for fn, table, n_scans in (
        (textstats.doc_profile, "documents", 1),
        (textstats.top_tokens_combined, "documents", 1),
        # back to 1 in round 5b: the PageRank subtree derives its graph
        # off the SAME persisted per-row projection (review fix)
        (webcorpus.host_profile, "documents", 1),
        (similarity.embedding_near_dup_labeled, "embeddings", 1),
        (similarity.semdedup, "embeddings", 1),
    ):
        plan = _plan(fn(spark, "/root/testdata/sf0.001"))
        assert f"{table}.parquet" in plan, fn.__name__
        assert _unique_parquet_scans(plan) == n_scans, (fn.__name__, plan)
        assert "InMemoryTableScan" in plan, fn.__name__


def test_multibranch_webcorpus_queries_scan_documents_once(spark):
    """ADVICE r3: host_stats/lang_confusion/url_normalize/snapshot_diff
    reference a shared subtree from two branches — each must persist it
    (scoped) so the documents scan (and the per-row work above it)
    executes exactly once per query."""
    from pdf_extractor2_spark.operators import webcorpus

    for fn in (webcorpus.host_stats, webcorpus.lang_confusion,
               webcorpus.url_normalize, webcorpus.snapshot_diff):
        plan = _plan(fn(spark, "/root/testdata/sf0.001"))
        assert "documents.parquet" in plan, fn.__name__
        assert _unique_parquet_scans(plan) == 1, (fn.__name__, plan)
        assert "InMemoryTableScan" in plan, fn.__name__


def test_knn_join_is_broadcast_and_sortless(spark):
    """The batch KNN join must broadcast the query set and rank via the
    two-phase bounded aggregate — no window Sort over corpus rows, no
    cartesian against a non-broadcast side."""
    from pdf_extractor2_spark.operators.similarity import ann_knn_join

    plan = _plan(ann_knn_join(spark, "/root/testdata/sf0.001"))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan, plan
    # two hash aggregates (bucket top-k, final merge), no global Sort
    import re

    assert not re.search(r"^\(\d+\) Sort", plan, re.M), plan
