"""Shared Spark-vs-DuckDB parity comparator for tests (review fix: four
near-identical copies had drifted across test files, two of them missing
the NaN/last-ulp float normalization guard).

``assert_parity(spark_df, sql, sf_dir, tables=...)`` registers each
named parquet table of ``sf_dir`` as a DuckDB view, runs the oracle
text, and compares column-sorted, row-sorted, float-normalized values.
"""

from __future__ import annotations

import math

import duckdb


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    return v


def assert_parity(spark_df, sql: str, sf_dir: str,
                  tables: tuple[str, ...] = ("documents",)) -> None:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    scols = [c.lower() for c in spark_df.columns]
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    a = sorted(tuple(norm(r[i]) for i in so) for r in srows)
    b = sorted(tuple(norm(r[i]) for i in do) for r in drows)
    assert a == b, (
        f"first diff: {next(((x, y) for x, y in zip(a, b) if x != y), None)}"
    )
    assert a  # non-empty
