"""Similarity search over the ``embeddings`` table (``array<float>``).

Two search paths:
  * brute-force cosine top-k — the exact baseline: broadcast the query
    vector, JVM-side ``zip_with``/``aggregate`` dot products (no Python),
    one narrow pass over the table;
  * IVF-style bucketed search — the scale path: restrict the scan to the
    query's coarse cell (here the ``label`` column stands in for the
    quantizer assignment), cutting the candidate set by the number of
    lists; same exact arithmetic inside the cell.

All floats are promoted to double before accumulation (sequential list
order in both engines) and similarities are rounded to 4 decimals so the
DuckDB oracle hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _with_query(spark: SparkSession, sf_dir: str, query_vec_id: int) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q"), F.col("label").alias("q_label")
    )
    return emb.crossJoin(F.broadcast(q))


def _cosine(df: DataFrame) -> DataFrame:
    dot = _DOT.format(a="embedding", b="q")
    na = _DOT.format(a="embedding", b="embedding")
    nb = _DOT.format(a="q", b="q")
    return df.withColumn(
        "cos_sim", F.expr(f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 4)")
    )


def ann_cosine_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k against one query vector."""
    return (
        _cosine(_with_query(spark, sf_dir, query_vec_id))
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", "cos_sim")
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 5
) -> DataFrame:
    """IVF-bucketed search: scan only the query's coarse cell (label)."""
    return (
        _cosine(_with_query(spark, sf_dir, query_vec_id))
        .where((F.col("vec_id") != query_vec_id) & (F.col("label") == F.col("q_label")))
        .select("vec_id", "label", "cos_sim")
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_near_dup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35, sig_dims: int = 8
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: block on the
    sign signature of the first ``sig_dims`` components (a deterministic
    hyperplane-LSH), compute exact cosine only inside buckets.  Candidate
    count scales with bucket collisions, never n²."""
    emb = _emb(spark, sf_dir)
    sig = F.expr(
        "concat_ws('', transform(slice(embedding, 1, {d}),"
        " x -> case when x >= 0 then '1' else '0' end))".format(d=sig_dims)
    )
    tagged = emb.select("vec_id", "embedding", sig.alias("sig"))
    a, b = tagged.alias("a"), tagged.alias("b")
    dot = _DOT.format(a="a.embedding", b="b.embedding")
    na = _DOT.format(a="a.embedding", b="a.embedding")
    nb = _DOT.format(a="b.embedding", b="b.embedding")
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cos_sim", F.expr(f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 4)"))
        .where(F.col("cos_sim") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cos_sim",
        )
    )


def embedding_near_dup_pairs_sql(
    table: str = "embeddings", threshold: float = 0.35, sig_dims: int = 8
) -> str:
    dot = _DOT_SQL.format(a="a.v", b="b.v")
    na = _DOT_SQL.format(a="a.v", b="a.v")
    nb = _DOT_SQL.format(a="b.v", b="b.v")
    return f"""
        WITH s AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 list_aggregate([CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END
                                 for i in generate_series(1, {sig_dims})],
                                'string_agg', '') AS sig
          FROM {table})
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(({dot}) / (sqrt({na}) * sqrt({nb})), 4) AS cos_sim
        FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
        WHERE round(({dot}) / (sqrt({na}) * sqrt({nb})), 4) >= {threshold}
    """


def label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector counts and mean L2 norm (rounded)."""
    emb = _emb(spark, sf_dir)
    norm = _DOT.format(a="embedding", b="embedding")
    return (
        emb.withColumn("norm", F.expr(f"sqrt({norm})"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("norm"), 4).alias("mean_norm"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle texts
# ---------------------------------------------------------------------------

_DOT_SQL = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _cos_sql(table: str, query_vec_id: int) -> str:
    dot = _DOT_SQL.format(a="e.embedding", b="q.embedding")
    na = _DOT_SQL.format(a="e.embedding", b="e.embedding")
    nb = _DOT_SQL.format(a="q.embedding", b="q.embedding")
    return f"""
        WITH q AS (SELECT embedding, label FROM {table} WHERE vec_id = {query_vec_id}),
        scored AS (
          SELECT e.vec_id, e.label, q.label AS q_label,
                 round(({dot}) / (sqrt({na}) * sqrt({nb})), 4) AS cos_sim
          FROM {table} e, q)
    """


def ann_cosine_topk_sql(table: str = "embeddings", query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
        {_cos_sql(table, query_vec_id)}
        SELECT vec_id, label, cos_sim FROM scored
        WHERE vec_id != {query_vec_id}
        ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}
    """


def ann_ivf_topk_sql(table: str = "embeddings", query_vec_id: int = 0, k: int = 5) -> str:
    return f"""
        {_cos_sql(table, query_vec_id)}
        SELECT vec_id, label, cos_sim FROM scored
        WHERE vec_id != {query_vec_id} AND label = q_label
        ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}
    """


def label_centroid_norms_sql(table: str = "embeddings") -> str:
    norm = _DOT_SQL.format(a="embedding", b="embedding")
    return f"""
        SELECT label, COUNT(*) AS n_vecs, round(AVG(sqrt({norm})), 4) AS mean_norm
        FROM {table} GROUP BY label
    """
