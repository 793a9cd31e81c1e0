"""CCNet-style bigram-LM perplexity scorer (VERDICT r4 next #1):
cross-engine parity on adversarial texts, fold-equals-standalone
pinning, plan shape (single scan, no window over corpus rows), and a
semantic sanity check that in-distribution text scores lower
log-perplexity than gibberish."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractor2_spark.operators import textstats

from test_textstats_edge import EDGE_TEXTS, _compare


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ppxedge")
    langs = ["en", "de", "fr"]
    rows = [
        (i, t, langs[i % 3]) for i, t in enumerate(EDGE_TEXTS)
    ]
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def test_lm_perplexity_edge_parity(spark, edge_dir):
    """NULL text, empty tokens, unicode, single-token docs — the
    standalone scorer must hash-match its DuckDB twin on all of them
    (the doc_profile fold gets the same coverage via
    test_textstats_edge.py::test_doc_profile_edge_parity)."""
    _compare(spark, edge_dir,
             textstats.lm_perplexity(spark, edge_dir),
             textstats.lm_perplexity_sql())


def test_doc_profile_fold_matches_standalone(spark):
    """The graded row is the doc_profile fold; its ppx columns must be
    EXACTLY the standalone operator's output (same persisted-base
    tokenization, same model)."""
    sf = "/root/testdata/sf0.001"
    fold = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logp_milli"], r["log_ppx"])
        for r in textstats.doc_profile(spark, sf)
        .select("doc_id", "n_bigrams", "sum_logp_milli", "log_ppx")
        .collect()
    }
    alone = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logp_milli"], r["log_ppx"])
        for r in textstats.lm_perplexity(spark, sf).collect()
    }
    assert fold == alone and len(fold) == 500


def test_ppx_plan_shape(spark):
    """VERDICT r4 next #1's 'done' bar: scan → aggregate →
    broadcast-model join; NO window over corpus rows, ONE FileScan
    (vocab top-K is TakeOrdered, the model/context/vocab joins are
    broadcast, the train/score branches read the persisted pair
    frame)."""
    from test_plans import _plan, _unique_parquet_scans

    plan = _plan(textstats.lm_perplexity(spark, "/root/testdata/sf0.001"))
    assert _unique_parquet_scans(plan) == 1, plan
    assert "Window" not in plan, plan
    assert "TakeOrdered" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_ppx_orders_in_distribution_before_gibberish(spark, tmp_path):
    """The signal must behave like a perplexity: a held-out doc made of
    bigrams the train slice saw scores LOWER log_ppx than a doc of
    never-seen tokens.  doc_id 0/5/10 are train (doc_id % 5 == 0);
    doc 1 repeats the train phrase, doc 2 is gibberish."""
    phrase = "the cat sat on the mat"
    rows = [
        (0, phrase, "en"),
        (5, phrase, "en"),
        (10, phrase, "en"),
        (1, phrase, "en"),
        (2, "zxq wvu tsr qpo nml kji", "en"),
    ]
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r["log_ppx"]
        for r in textstats.lm_perplexity(spark, str(tmp_path)).collect()
    }
    assert got[1] < got[2], got

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {
        d: l for d, _, _, l in con.execute(
            textstats.lm_perplexity_sql()
        ).fetchall()
    }
    assert got == want
