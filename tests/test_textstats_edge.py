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
    None,                                   # NULL text: coalesce'd to ''
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
    rows = [
        (i, t, langs[i % 3], "web", len(t) if t is not None else 0)
        for i, t in enumerate(EDGE_TEXTS)
    ]
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


def test_doc_profile_edge_parity(spark, edge_dir):
    from pdf_extractor2_spark.operators import textstats

    _compare(spark, edge_dir,
             textstats.doc_profile(spark, edge_dir),
             textstats.doc_profile_sql())


def test_top_tokens_combined_edge_parity(spark, edge_dir):
    from pdf_extractor2_spark.operators import textstats

    _compare(spark, edge_dir,
             textstats.top_tokens_combined(spark, edge_dir),
             textstats.top_tokens_combined_sql())


def test_doc_profile_matches_individual_ops(spark, edge_dir):
    """The fused doc_profile is the SAME logic as the seven individual
    per-doc operators — column-for-column equal on the adversarial edge
    corpus, so the fused driver row keeps grading the originals."""
    from pdf_extractor2_spark.operators import textstats

    prof = {
        r["doc_id"]: r.asDict()
        for r in textstats.doc_profile(spark, edge_dir).collect()
    }
    assert len(prof) == len(EDGE_TEXTS)

    def check(df, mapping):
        for r in df.collect():
            p = prof[r["doc_id"]]
            for op_col, prof_col in mapping.items():
                assert _norm(r[op_col]) == _norm(p[prof_col]), (
                    op_col, r["doc_id"], r[op_col], p[prof_col]
                )

    check(textstats.token_stats(spark, edge_dir),
          {"n_tokens": "n_tokens", "n_distinct_tokens": "n_distinct_tokens",
           "n_chars_actual": "n_chars_actual"})
    check(textstats.quality_scores(spark, edge_dir),
          {"lang": "lang", "stopword_ratio": "stopword_ratio",
           "mean_token_len": "mean_token_len",
           "quality_bucket": "quality_bucket"})
    check(textstats.fingerprints(spark, edge_dir),
          {"fingerprint": "fingerprint"})
    check(textstats.lang_id(spark, edge_dir), {"pred_lang": "pred_lang"})
    check(textstats.bpe_token_stats(spark, edge_dir),
          {"n_bpe_tokens": "n_bpe_tokens", "n_ws_tokens": "n_tokens",
           "bpe_per_word": "bpe_per_word"})
    check(textstats.quality_gates(spark, edge_dir),
          {"n_words": "n_tokens", "mean_word_len": "mean_token_len",
           "has_min_words": "has_min_words", "word_len_ok": "word_len_ok",
           "no_lorem": "no_lorem", "no_brace": "no_brace", "kept": "kept"})
    check(textstats.repetition_stats(spark, edge_dir),
          {"n_tokens": "n_tokens", "n_3grams": "n_3grams",
           "n_distinct_3grams": "n_distinct_3grams",
           "dup_3gram_frac": "dup_3gram_frac",
           "top_token_frac": "top_token_frac"})


def test_top_tokens_combined_matches_parts(spark, edge_dir):
    """The per-lang slice equals top_tokens_by_lang; the global slice
    (lang='*') carries the same (token, n) set as the standalone global
    top_tokens."""
    from pdf_extractor2_spark.operators import textstats

    combined = textstats.top_tokens_combined(spark, edge_dir).collect()
    by_lang = sorted(
        tuple(r) for r in textstats.top_tokens_by_lang(spark, edge_dir).collect()
    )
    got_lang = sorted(
        (r["lang"], r["token"], r["n"], r["rank"])
        for r in combined if r["lang"] != "*"
    )
    assert got_lang == by_lang and got_lang

    glob = {(r["token"], r["n"]) for r in textstats.top_tokens(spark, edge_dir).collect()}
    got_glob = {(r["token"], r["n"]) for r in combined if r["lang"] == "*"}
    assert got_glob == glob and got_glob


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
