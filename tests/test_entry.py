"""Driver-contract conformance: run every queries() entry and compare to
its DuckDB oracle the way the driver does (row count + column names +
order-insensitive values)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns and len(rows) >= 0


def test_all_queries_have_unique_names():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # round 3: every driver query is oracle-paired (extract_pipeline's
    # synthesized entity sections made the flagship SQL-derivable)
    rows_only = set(q) - set(o)
    assert rows_only == set()


DRIVER_CAP = 50


def test_queries_fit_driver_cap():
    """The grading driver records CORRECTNESS rows for only the first
    ``DRIVER_CAP`` queries() entries (round-3 VERDICT: 11 of 61 entries
    silently fell past the cap and lost their graded rows).  Every entry
    must fit under the cap — grow by FOLDING related operators into one
    graded row (see queries() docstring), never by appending past 50."""
    q = entrymod.queries()
    assert len(q) <= DRIVER_CAP, (
        f"{len(q)} queries() entries exceed the driver's {DRIVER_CAP}-row "
        f"correctness check; consolidate (every entry past the cap is "
        f"silently ungraded)"
    )
    assert len(entrymod.oracle_sql()) == len(q)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    a = _rows_to_set(spark_cols, spark_rows)
    b = _rows_to_set(duck_cols, duck_rows)
    assert a == b, f"{name}: values differ; first mismatch: " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), (a[:2], b[:2]))
    )


def test_no_unhashable_columns_in_driver_projections(spark):
    """The driver canonicalizes results with pandas sort_values, which
    dies on array/map/struct cells — every queries() schema must be flat
    (round-1 regression: `methods array<string>`, `feature array<float>`)."""
    from pyspark.sql import types as T

    for name, q in entrymod.queries().items():
        df = q(spark, SF_DIR)
        for f in df.schema.fields:
            assert not isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            ), f"{name}.{f.name} is {f.dataType.simpleString()}"
