"""Cross-engine parity of the round-3 text operators on adversarial
texts — empty strings, consecutive spaces (empty tokens), unicode,
halfway-rounding ratios (1/128 = 0.0078125 rounds differently under
Spark round() vs DuckDB round(); the operators use the floor idiom),
single-token docs, and fully-repeated documents."""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EDGE_TEXTS = [
    "",                                     # empty: split -> ['']
    "one",                                  # single token, no 3-grams
    "a b",                                  # below shingle width
    "x y z",                                # exactly one 3-gram
    "w w w w w w w w",                      # fully repeated token
    "a  b   c",                             # consecutive spaces -> empty tokens
    "æøå über 北京 déjà vu encore une fois", # unicode tokens
    " ".join(["t"] * 128),                  # 1/128-style halfway ratios
    " ".join(f"u{i}" for i in range(130)),  # all-distinct long doc
    "p q r p q r p q r p q r",              # repeated 3-gram block
    "{ code } lorem ipsum dolor",           # quality-gate trigger text
    " ".join(["word"] * 49) + " tail",      # exactly 50 words boundary
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edgetexts")
    langs = ["en", "de", "fr"]
    rows = [(i, t, langs[i % 3], "web", len(t)) for i, t in enumerate(EDGE_TEXTS)]
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    return v


def _compare(spark, edge_dir, spark_df, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_dir}/documents.parquet')"
    )
    scols = [c.lower() for c in spark_df.columns]
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    a = sorted(tuple(_norm(r[i]) for i in so) for r in srows)
    b = sorted(tuple(_norm(r[i]) for i in do) for r in drows)
    assert a == b, f"first diff: {next(((x, y) for x, y in zip(a, b) if x != y), None)}"
    assert a  # non-empty


def test_repetition_stats_edge_parity(spark, edge_dir):
    from pdf_extractor2_spark.operators import textstats

    _compare(spark, edge_dir,
             textstats.repetition_stats(spark, edge_dir),
             textstats.repetition_stats_sql())


def test_quality_gates_edge_parity(spark, edge_dir):
    from pdf_extractor2_spark.operators import textstats

    _compare(spark, edge_dir,
             textstats.quality_gates(spark, edge_dir),
             textstats.quality_gates_sql())


def test_top_tokens_by_lang_edge_parity(spark, edge_dir):
    from pdf_extractor2_spark.operators import textstats

    _compare(spark, edge_dir,
             textstats.top_tokens_by_lang(spark, edge_dir),
             textstats.top_tokens_by_lang_sql())


def test_duplicate_span_stats_edge_parity(spark, edge_dir):
    from pdf_extractor2_spark.operators import dedup

    _compare(spark, edge_dir,
             dedup.duplicate_span_stats(spark, edge_dir),
             dedup.duplicate_span_stats_sql())


def test_token_budget_sample_edge_parity(spark, edge_dir):
    from pdf_extractor2_spark.plans import relational

    _compare(spark, edge_dir,
             relational.token_budget_sample(spark, edge_dir, budget_tokens=160),
             relational.token_budget_sample_sql(budget_tokens=160))
