"""Recall-vs-cost sweep for the embedding near-dup blocker (VERDICT r4
next #4): measure, against exact all-pairs ground truth (cos >= t),
what fraction of true pairs each banding config's candidate set covers
(recall) and how many candidate pairs it scores relative to all-pairs
(cost).  Configs cover the current axis-sign banding, Hamming-1
multiprobe variants, and counts/dims trade-offs.  DuckDB is the
measurement engine (identical banding semantics to the Spark side —
sign bits over embedding components).

Usage: python BENCH/neardup_recall_sweep.py [sf_dir] [threshold]
"""

from __future__ import annotations

import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
T = float(sys.argv[2]) if len(sys.argv) > 2 else 0.35

con = duckdb.connect()
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
)
n = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]

truth = con.execute(f"""
    SELECT a.vec_id, b.vec_id
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
          / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
             * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
          >= {T}
""").fetchall()
truth_set = set(truth)
allpairs = n * (n - 1) // 2
print(f"sf={SF} n_vecs={n} all_pairs={allpairs} true_pairs={len(truth_set)}")


def band_keys_sql(n_bands: int, band_dims: int) -> str:
    """(vec_id, band, key) — axis-sign bits, same as the operator."""
    parts = []
    for j in range(n_bands):
        lo, hi = j * band_dims + 1, (j + 1) * band_dims
        parts.append(
            f"""SELECT vec_id, {j} AS band,
                list_aggregate([CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END
                                for i in generate_series({lo}, {hi})], 'string_agg', '') AS key
                FROM embeddings"""
        )
    return "\nUNION ALL\n".join(parts)


def measure(tag: str, n_bands: int, band_dims: int, probe_h1: bool) -> None:
    if n_bands * band_dims > 64:
        print(f"{tag}: skipped (needs {n_bands * band_dims} > 64 dims)")
        return
    keys = band_keys_sql(n_bands, band_dims)
    if probe_h1:
        # a-side also emits every Hamming-1 variant of its key
        probes = f"""
            SELECT vec_id, band, key FROM bands
            UNION ALL
            SELECT vec_id, band,
                   substr(key, 1, f - 1)
                     || (CASE WHEN substr(key, f, 1) = '1' THEN '0' ELSE '1' END)
                     || substr(key, f + 1) AS key
            FROM bands, generate_series(1, {band_dims}) g(f)
        """
    else:
        probes = "SELECT vec_id, band, key FROM bands"
    cand = con.execute(f"""
        WITH bands AS ({keys}),
        probed AS ({probes})
        SELECT DISTINCT a.vec_id, b.vec_id
        FROM probed a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
    """).fetchall()
    cand_set = set(cand)
    rec = len(cand_set & truth_set) / max(len(truth_set), 1)
    cost = len(cand_set) / allpairs
    print(f"{tag}: bands={n_bands} dims={band_dims} h1={probe_h1} "
          f"recall={rec:.3f} cost={cost:.3f} candidates={len(cand_set)}")


def rproj_keys_sql(n_bands: int, band_dims: int) -> str:
    """(vec_id, band, key) — Rademacher random-projection sign bits:
    bit (j,i) = sign(Σ_m ±emb[m]), the ±1 pattern a deterministic
    integer hash of (bit index k = j*dims+i, component m).  Unlimited
    independent bits (not capped at 64 axis signs); the fold order is
    the list order, so Spark/DuckDB doubles agree bitwise."""
    parts = []
    for j in range(n_bands):
        bits = []
        for i in range(band_dims):
            k = j * band_dims + i
            bits.append(
                f"CASE WHEN list_sum([CAST(embedding[m + 1] AS DOUBLE)"
                f" * (CASE WHEN (({k} * 2654435761 + m * 40503) % 65536)"
                f" < 32768 THEN 1 ELSE -1 END)"
                f" for m in generate_series(0, 63)]) >= 0"
                f" THEN '1' ELSE '0' END"
            )
        key = " || ".join(bits)
        parts.append(f"SELECT vec_id, {j} AS band, {key} AS key FROM embeddings")
    return "\nUNION ALL\n".join(parts)


def measure_rproj(tag: str, n_bands: int, band_dims: int, probe_h1: bool) -> None:
    keys = rproj_keys_sql(n_bands, band_dims)
    if probe_h1:
        probes = f"""
            SELECT vec_id, band, key FROM bands
            UNION ALL
            SELECT vec_id, band,
                   substr(key, 1, f - 1)
                     || (CASE WHEN substr(key, f, 1) = '1' THEN '0' ELSE '1' END)
                     || substr(key, f + 1) AS key
            FROM bands, generate_series(1, {band_dims}) g(f)
        """
    else:
        probes = "SELECT vec_id, band, key FROM bands"
    cand = con.execute(f"""
        WITH bands AS ({keys}),
        probed AS ({probes})
        SELECT DISTINCT a.vec_id, b.vec_id
        FROM probed a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
    """).fetchall()
    cand_set = set(cand)
    rec = len(cand_set & truth_set) / max(len(truth_set), 1)
    cost = len(cand_set) / allpairs
    print(f"{tag}: rproj bands={n_bands} dims={band_dims} h1={probe_h1} "
          f"recall={rec:.3f} cost={cost:.3f} candidates={len(cand_set)}")


measure("A(current)", 8, 5, False)
measure("B", 12, 5, False)
measure("C", 16, 4, False)
measure("D", 8, 5, True)
measure("E", 8, 6, True)
measure("F", 9, 7, True)
measure("G", 10, 6, True)
measure("H", 8, 8, True)
measure("I", 8, 7, True)
measure_rproj("R1", 12, 8, True)
measure_rproj("R2", 16, 8, True)
measure_rproj("R3", 20, 8, True)
measure_rproj("R4", 16, 10, True)
measure_rproj("R5", 24, 10, True)
measure_rproj("R6", 12, 9, True)
measure_rproj("R7", 16, 9, True)
