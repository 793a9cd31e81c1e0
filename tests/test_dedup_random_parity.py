"""Randomized cross-engine parity for the whole dedup family: a seeded
corpus with planted exact duplicates, mutated near-duplicates, shared
boilerplate fragments and unicode — every operator's Spark result must
hash-match its DuckDB oracle (same idiom as the driver's correctness
gate, on data specifically built to exercise collision paths)."""

from __future__ import annotations

import math
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractor2_spark.operators import dedup


@pytest.fixture(scope="module")
def rand_dir(tmp_path_factory):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(120)] + ["æble", "北京", "déjà"]
    boiler = "shared boilerplate sentence fragment here"
    docs: list[str] = []
    for _ in range(60):
        n = rng.randint(8, 40)
        toks = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
        if rng.random() < 0.4:
            toks = boiler.split() + toks
        docs.append(" ".join(toks))
    # planted exact duplicates
    docs += [docs[3], docs[10], docs[10]]
    # planted near-duplicates: single-token mutations of existing docs
    for src in (5, 17, 29):
        toks = docs[src].split()
        toks[rng.randrange(len(toks))] = "mutated"
        docs.append(" ".join(toks))

    d = tmp_path_factory.mktemp("randdedup")
    table = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    return v


def _compare(rand_dir, spark_df, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{rand_dir}/documents.parquet')"
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
    return a


def test_exact_dedup_random_parity(spark, rand_dir):
    rows = _compare(rand_dir,
                    dedup.exact_dedup_summary(spark, rand_dir),
                    dedup.exact_dedup_summary_sql())
    assert rows  # one summary row; 3 planted exact dups must register
    # columns sorted: (n_distinct_texts, n_docs, n_dup_docs, n_dup_groups)
    assert rows[0][2] == 3 and rows[0][3] == 2


def test_jaccard_random_parity(spark, rand_dir):
    rows = _compare(rand_dir,
                    dedup.jaccard_pairs(spark, rand_dir, threshold=0.5),
                    dedup.jaccard_pairs_sql(threshold=0.5))
    assert len(rows) >= 3  # the planted near-dup pairs must surface


def test_minhash_random_parity(spark, rand_dir):
    rows = _compare(rand_dir,
                    dedup.minhash_lsh_pairs(spark, rand_dir),
                    dedup.minhash_lsh_pairs_sql())
    assert rows


def test_simhash_random_parity(spark, rand_dir):
    _compare(rand_dir, dedup.simhash(spark, rand_dir), dedup.simhash_sql())


def test_dedup_groups_random_parity(spark, rand_dir):
    rows = _compare(rand_dir,
                    dedup.dedup_groups(spark, rand_dir),
                    dedup.dedup_groups_sql())
    assert rows


def test_duplicate_span_stats_random_parity(spark, rand_dir):
    rows = _compare(rand_dir,
                    dedup.duplicate_span_stats(spark, rand_dir),
                    dedup.duplicate_span_stats_sql())
    # boilerplate-carrying docs must show nonzero duplicated spans
    assert any(r[2] > 0 for r in rows)  # sorted cols: (..., n_dup_spans, n_spans)
