"""Weighted data-mixing extension of token_budget_sample (round 5):
target-mixture budgets per language, even-split back-compat pin,
zero-weight language dropping, and cross-engine parity.
"""

from __future__ import annotations

import duckdb

from pdf_extractor2_spark.plans import relational

SF_DIR = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _assert_parity(spark_df, sf_dir, sql):
    from parity import assert_parity

    assert_parity(spark_df, sql, sf_dir, tables=("documents",))


def test_mixture_default_parity(spark):
    """The graded-row shape (MIX_WEIGHTS, 12k budget) hash-matches its
    DuckDB twin."""
    _assert_parity(
        relational.token_budget_sample(spark, SF_DIR), SF_DIR,
        relational.token_budget_sample_sql(),
    )


def test_even_split_is_round4_behaviour(spark):
    """weights=None must reproduce the round-4 even split: with the r4
    default budget (60k), every (lang,bucket) budget is 7500 and the
    whole sf0.01 corpus fits — the 500-row selection CORRECTNESS_r04
    recorded — and it stays parity-green."""
    df = relational.token_budget_sample(
        spark, SF01, budget_tokens=60_000, weights=None
    )
    rows = df.collect()
    assert len(rows) == 500
    assert {r["bucket_budget"] for r in rows} == {7500}
    _assert_parity(
        relational.token_budget_sample(spark, SF_DIR, budget_tokens=60_000,
                                       weights=None),
        SF_DIR,
        relational.token_budget_sample_sql(budget_tokens=60_000, weights=None),
    )


def test_mixture_budgets_enforced(spark):
    """Every (lang, bucket) token sum respects its CASE-mapped budget,
    budgets follow the integer weight arithmetic, and only weighted
    languages appear."""
    budget, n_buckets = 12_000, 8
    rows = relational.token_budget_sample(spark, SF01).collect()
    total_w = sum(relational.MIX_WEIGHTS.values())
    expected = {
        lang: (budget * w // total_w) // n_buckets
        for lang, w in relational.MIX_WEIGHTS.items()
    }
    assert {r["lang"] for r in rows} <= set(relational.MIX_WEIGHTS)
    sums: dict[tuple, int] = {}
    for r in rows:
        assert r["bucket_budget"] == expected[r["lang"]], r
        key = (r["lang"], r["bucket"])
        sums[key] = sums.get(key, 0) + r["n_tokens"]
    for (lang, _), s in sums.items():
        assert s <= expected[lang]
    # the mixture must actually select a PROPER subset at sf0.01
    assert 0 < len(rows) < 500


def test_zero_weight_language_dropped(spark):
    rows = relational.token_budget_sample(
        spark, SF01, weights={"en": 1}
    ).collect()
    assert rows and {r["lang"] for r in rows} == {"en"}


def test_feasible_mixture_budget(spark):
    """T* is the exact integer min over languages of avail·S/w, the
    budget is achievable (every weighted language can fill its share),
    and one unit more would overshoot some language's supply."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF01}/documents.parquet')"
    )
    avail = dict(con.execute(
        "SELECT lang, CAST(SUM(len(string_split(coalesce(text,''),' '))) "
        "AS BIGINT) FROM documents GROUP BY lang"
    ).fetchall())
    w = relational.MIX_WEIGHTS
    s = sum(w.values())
    want = min(avail[l] * s // wl for l, wl in w.items())
    got = relational.feasible_mixture_budget(spark, SF01)
    assert got == want
    for lang, wl in w.items():
        assert got * wl // s <= avail[lang]          # feasible
    assert any((want + s) * wl // s > avail[lang]    # and maximal
               for lang, wl in w.items())
    # headroom scales down exactly
    assert relational.feasible_mixture_budget(
        spark, SF01, headroom_num=9, headroom_den=10
    ) == want * 9 // 10


def test_feasible_budget_missing_language_is_zero(spark):
    assert relational.feasible_mixture_budget(
        spark, SF01, weights={"en": 1, "xx": 1}
    ) == 0


def test_pack_sequences_parity(spark):
    from parity import assert_parity

    assert_parity(relational.pack_sequences(spark, SF_DIR),
                  relational.pack_sequences_sql(), SF_DIR)
    assert_parity(relational.pack_sequences(spark, SF01, seq_len=64),
                  relational.pack_sequences_sql(seq_len=64), SF01)


def test_pack_sequences_invariants(spark):
    """Concat-then-chunk semantics: per doc the spans reassemble the
    whole document; per (lang, bucket) shard every sequence except the
    last is exactly full; spans within a sequence tile without overlap;
    documents genuinely cross sequence boundaries at seq_len=64."""
    sl = 64
    rows = relational.pack_sequences(spark, SF01, seq_len=sl).collect()
    sel = {r["doc_id"]: r for r in
           relational.token_budget_sample(spark, SF01).collect()}

    by_doc: dict[int, int] = {}
    by_seq: dict[tuple, list] = {}
    for r in rows:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["n_toks"]
        by_seq.setdefault((r["lang"], r["bucket"], r["seq_id"]), []).append(r)
    assert by_doc == {d: s["n_tokens"] for d, s in sel.items()
                      if s["n_tokens"] > 0}

    shard_max = {}
    for (lang, bucket, seq), srs in by_seq.items():
        spans = sorted((r["start_in_seq"], r["n_toks"]) for r in srs)
        pos = spans[0][0]
        for st, n in spans:
            assert st == pos  # no gap, no overlap
            pos = st + n
        assert pos <= sl
        key = (lang, bucket)
        shard_max[key] = max(shard_max.get(key, -1), seq)
    for (lang, bucket, seq), srs in by_seq.items():
        filled = sum(r["n_toks"] for r in srs)
        first = min(r["start_in_seq"] for r in srs)
        if seq < shard_max[(lang, bucket)]:
            assert first + filled == sl, (lang, bucket, seq)  # full
    assert sum(1 for d in by_doc
               if len([r for r in rows if r["doc_id"] == d]) > 1) > 0


def test_fold_packing_origin_matches_pack_sequences(spark):
    """token_budget_sample's (seq_id, seq_start) columns are exactly the
    first span pack_sequences emits for that document."""
    first = {}
    for r in relational.pack_sequences(spark, SF01).collect():
        cur = first.get(r["doc_id"])
        if cur is None or r["seq_id"] < cur[0]:
            first[r["doc_id"]] = (r["seq_id"], r["start_in_seq"])
    for s in relational.token_budget_sample(spark, SF01).collect():
        if s["n_tokens"] > 0:
            assert (s["seq_id"], s["seq_start"]) == first[s["doc_id"]], s
