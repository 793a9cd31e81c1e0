"""Driver-mimic correctness sweep: plain SparkSession (Spark 4 defaults,
ANSI on) + DuckDB oracle compare at sf0.01 (override the scale with
``PEX2_SWEEP_SF=/root/testdata/sf0.1``), all queries."""
import os, sys, json, hashlib
sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF = os.environ.get("PEX2_SWEEP_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.executorEnv.PYTHONHASHSEED", "0")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

import __spark_entry__ as em

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple(str(x) for x in row) for row in df.itertuples(index=False, name=None)
    )
    return hashlib.sha256(json.dumps(rows).encode()).hexdigest()

qs, osql = em.queries(), em.oracle_sql()
results = {}
only = sys.argv[1:] or list(qs)
for name in only:
    fn = qs[name]
    try:
        sdf = fn(spark, SF).toPandas()
        odf = con.execute(osql[name]).fetchdf()
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        h = canon(sdf) == canon(odf)
        results[name] = {"rows": rows, "schema": schema, "hash": h,
                         "n": len(sdf), "on": len(odf)}
        flag = "OK " if (rows and schema and h) else "FAIL"
        print(f"{flag} {name} rows={rows} schema={schema} hash={h} n={len(sdf)}", flush=True)
    except Exception as e:
        results[name] = {"err": str(e)[:300]}
        print(f"ERR {name}: {str(e)[:300]}", flush=True)

bad = [k for k, v in results.items() if v.get("err") or not (v.get("rows") and v.get("schema") and v.get("hash"))]
print("BAD:", bad)
print("SUMMARY", len(results) - len(bad), "/", len(results), "green")
