"""Round-5: substring-level dedup REMOVAL (`trim_duplicate_spans`) —
the Lee-et-al. operation `duplicate_span_stats` only reported.

Pins: exact hand-computed removal semantics on a crafted corpus,
cross-engine parity (fixture + sf0.001), the graded-row fold identity,
and NULL/short-text robustness."""

from __future__ import annotations

import hashlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractor2_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def _write(tmp_path, rows):
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _duck(path, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM"
                f" read_parquet('{path}/documents.parquet')")
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_trim_semantics_hand_computed(spark, tmp_path):
    """Two docs share one verbatim 8-token run; only the tokens covered
    by that run's windows are removed, surrounding unique text stays."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 toks
    d0 = f"one two three {shared} four five six"
    d1 = f"seven eight {shared} nine ten"
    d2 = "totally unique text with no overlap at all whatsoever here"
    path = _write(tmp_path, [(0, d0), (1, d1), (2, d2)])

    got = {r["doc_id"]: r for r in
           dedup.trim_duplicate_spans(spark, path).collect()}
    want0 = "one two three four five six"
    want1 = "seven eight nine ten"
    assert got[0]["n_tokens"] == 14 and got[0]["n_kept_tokens"] == 6
    assert got[0]["trimmed_digest"] == hashlib.md5(want0.encode()).hexdigest()
    assert got[0]["trimmed_len"] == len(want0)
    assert got[1]["n_kept_tokens"] == 4
    assert got[1]["trimmed_digest"] == hashlib.md5(want1.encode()).hexdigest()
    assert got[2]["n_kept_tokens"] == got[2]["n_tokens"] == 10
    assert got[2]["trimmed_digest"] == hashlib.md5(d2.encode()).hexdigest()


def test_trim_overlapping_windows_union_coverage(spark, tmp_path):
    """A 10-token shared run generates three overlapping duplicated
    windows; coverage is their UNION (all 10 tokens), not 3×8 double
    counting — and a doc shorter than k tokens is returned untouched."""
    shared = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    path = _write(tmp_path, [
        (0, f"pre {shared} post"),
        (1, shared),
        (2, "tiny doc"),
        (3, None),
    ])
    got = {r["doc_id"]: r for r in
           dedup.trim_duplicate_spans(spark, path).collect()}
    assert got[0]["n_tokens"] == 12 and got[0]["n_kept_tokens"] == 2
    assert got[0]["trimmed_digest"] == hashlib.md5(b"pre post").hexdigest()
    assert got[1]["n_kept_tokens"] == 0
    assert got[1]["trimmed_digest"] == hashlib.md5(b"").hexdigest()
    assert got[2]["n_kept_tokens"] == 2          # < k tokens: untouched
    assert got[3]["n_tokens"] == 1               # NULL → [''] like _docs_nn
    assert got[3]["trimmed_digest"] == hashlib.md5(b"").hexdigest()

    assert sorted(tuple(r) for r in
                  dedup.trim_duplicate_spans(spark, path).collect()) \
        == _duck(path, dedup.trim_duplicate_spans_sql())


def test_trim_parity_sf0001(spark):
    got = sorted(tuple(r) for r in
                 dedup.trim_duplicate_spans(spark, SF).collect())
    want = _duck("/root/testdata/sf0.001", dedup.trim_duplicate_spans_sql())
    assert got == want and len(got) == 500
    assert any(r[2] < r[1] for r in got)  # the corpus has real removals


def test_span_stats_fold_matches_standalone(spark):
    """The graded row (with_trim default) == stats(with_trim=False)
    ⋈ trim standalone, column for column; and the fold hash-matches
    its own combined SQL twin."""
    fold = sorted(tuple(r) for r in
                  dedup.duplicate_span_stats(spark, SF).collect())
    stats = {r["doc_id"]: tuple(r) for r in
             dedup.duplicate_span_stats(spark, SF, with_trim=False).collect()}
    trim = {r["doc_id"]: tuple(r)[1:] for r in
            dedup.trim_duplicate_spans(spark, SF).collect()}
    want = sorted(stats[d] + trim[d] for d in stats)
    assert fold == want and len(fold) == 500
    assert fold == _duck("/root/testdata/sf0.001",
                         dedup.duplicate_span_stats_sql())
    legacy = sorted(stats[d] for d in stats)
    assert legacy == _duck("/root/testdata/sf0.001",
                           dedup.duplicate_span_stats_sql(with_trim=False))


def _trim_reference(docs: dict[int, str], k: int = 8):
    """Independent pure-Python model of the trim semantics: a window is
    duplicated iff its k-token text occurs in ≥ 2 DISTINCT docs; every
    token covered by any duplicated window in a doc is removed."""
    toks = {d: (t if t is not None else "").split(" ") for d, t in docs.items()}
    where = {}
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            where.setdefault(" ".join(ts[i:i + k]), set()).add(d)
    dup = {g for g, ds in where.items() if len(ds) >= 2}
    out = {}
    for d, ts in toks.items():
        cov = set()
        for i in range(len(ts) - k + 1):
            if " ".join(ts[i:i + k]) in dup:
                cov.update(range(i, i + k))
        kept = [t for i, t in enumerate(ts) if i not in cov]
        trimmed = " ".join(kept)
        out[d] = (len(ts), len(kept), len(trimmed),
                  hashlib.md5(trimmed.encode()).hexdigest())
    return out


@pytest.mark.parametrize("seed", [3, 13])
def test_trim_fuzz_vs_python_reference(spark, tmp_path, seed):
    """Randomized semantic fuzz: Spark (and the DuckDB twin) must match
    an INDEPENDENT Python implementation — catches a shared
    misconception between the two SQL texts that parity alone cannot."""
    import random

    rng = random.Random(seed)
    words = [f"w{i}" for i in range(60)]
    docs = {}
    snippets = [" ".join(rng.choice(words) for _ in range(rng.randrange(8, 14)))
                for _ in range(6)]
    for d in range(80):
        kind = rng.randrange(5)
        if kind == 0:
            docs[d] = None if rng.random() < 0.5 else ""
        elif kind == 1:
            docs[d] = " ".join(rng.choice(words)
                               for _ in range(rng.randrange(1, 8)))
        else:
            parts = [" ".join(rng.choice(words)
                              for _ in range(rng.randrange(0, 10)))]
            for _ in range(rng.randrange(0, 3)):
                parts.append(rng.choice(snippets))
                parts.append(" ".join(rng.choice(words)
                                      for _ in range(rng.randrange(0, 6))))
            docs[d] = " ".join(p for p in parts if p)
    path = _write(tmp_path, sorted(docs.items()))

    want = _trim_reference(docs)
    got = {r["doc_id"]: (r["n_tokens"], r["n_kept_tokens"],
                         r["trimmed_len"], r["trimmed_digest"])
           for r in dedup.trim_duplicate_spans(spark, path).collect()}
    assert got == want
    assert sorted((d, *v) for d, v in got.items()) \
        == _duck(path, dedup.trim_duplicate_spans_sql())
    assert any(v[1] < v[0] for v in got.values())  # fuzz planted real dups
