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


# measured at sf0.01 vs ground truth (cos >= 0.35): 8 bands x 5 sign dims
# gives recall 0.53 scoring 22% of all pairs; the old monolithic 8-bit
# block had recall 0.026.  At larger n, raise band_dims (bucket count is
# 2^band_dims) to keep per-bucket collision counts bounded.
N_SIG_BANDS = 8
BAND_DIMS = 5


def embedding_near_dup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35,
    n_bands: int = N_SIG_BANDS, band_dims: int = BAND_DIMS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, banded hyperplane-LSH:
    the sign pattern of the first ``n_bands*band_dims`` components is
    split into ``n_bands`` bands of ``band_dims`` sign bits; candidates
    are pairs agreeing on ≥1 whole band (multi-probe — the same banding
    idea as MinHash-LSH), exact cosine is computed only for candidates.

    A single monolithic sign block misses near-dups that straddle one
    hyperplane; banding recovers them (recall is provably ≥ the
    monolithic block's: agreeing on all bits implies agreeing on every
    band).  Candidate count still scales with bucket collisions, never
    n²; the recall/cost knob is (n_bands, band_dims)."""
    emb = _emb(spark, sf_dir)
    band_cols = [
        F.expr(
            "concat_ws('', transform(slice(embedding, {start}, {d}),"
            " x -> case when x >= 0 then '1' else '0' end))".format(
                start=j * band_dims + 1, d=band_dims
            )
        ).alias("key")
        for j in range(n_bands)
    ]
    bands = None
    for j, key in enumerate(band_cols):
        part = emb.select("vec_id", F.lit(j).alias("band"), key)
        bands = part if bands is None else bands.unionByName(part)

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()  # a pair may collide in several bands — score once
    )

    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    dot = _DOT.format(a="emb_a", b="emb_b")
    na = _DOT.format(a="emb_a", b="emb_a")
    nb = _DOT.format(a="emb_b", b="emb_b")
    return (
        cand.join(ea, "vec_a").join(eb, "vec_b")
        .withColumn("cos_sim", F.expr(f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 4)"))
        .where(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def embedding_near_dup_pairs_sql(
    table: str = "embeddings", threshold: float = 0.35,
    n_bands: int = N_SIG_BANDS, band_dims: int = BAND_DIMS,
) -> str:
    band_selects = "\nUNION ALL\n".join(
        f"""SELECT vec_id, {j} AS band,
               list_aggregate([CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END
                               for i in generate_series({j * band_dims + 1}, {(j + 1) * band_dims})],
                              'string_agg', '') AS key
            FROM {table}"""
        for j in range(n_bands)
    )
    dot = _DOT_SQL.format(a="ea.embedding", b="eb.embedding")
    na = _DOT_SQL.format(a="ea.embedding", b="ea.embedding")
    nb = _DOT_SQL.format(a="eb.embedding", b="eb.embedding")
    return f"""
        WITH bands AS ({band_selects}),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
        SELECT vec_a, vec_b,
               round(({dot}) / (sqrt({na}) * sqrt({nb})), 4) AS cos_sim
        FROM cand
        JOIN {table} ea ON ea.vec_id = vec_a
        JOIN {table} eb ON eb.vec_id = vec_b
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
