"""Real image decode (round 5, VERDICT r4 next #3): pure-stdlib
PNG-gray8 / BMP24 codecs — roundtrip against the closed-form pixel
formula, byte-length closed forms (what the DuckDB oracle relies on),
all five PNG filter types, corrupt-payload fallback to the digest
path, and the Spark-side mixed corpus end-to-end."""

from __future__ import annotations

import hashlib

from pdf_extractor2_spark.operators import multimodal as mm


def _expected(doc_id: int):
    w, h = mm._img_dims(doc_id)
    lum = sum((doc_id * 31 + i * 7) % 256 for i in range(w * h))
    return w, h, (doc_id * 31) % 256, lum


def test_codec_roundtrip_and_length_closed_forms():
    """Decoders must recover the exact synthesis pixels for every
    (w mod 4) padding class and every PNG filter (h ≥ 8 > 5 rows, so
    each image exercises all five); encoded lengths must equal the
    oracle's closed forms."""
    for d in range(0, 400):
        w, h, first, lum = _expected(d)
        bmp, png = mm.gen_bmp24(d), mm.gen_png_gray8(d)
        assert mm.decode_bmp24(bmp) == (w, h, 3, first, lum), d
        assert mm.decode_png_gray8(png) == (w, h, 1, first, lum), d
        rowsz = ((3 * w + 3) // 4) * 4
        assert len(bmp) == 54 + h * rowsz, d
        assert len(png) == 68 + h * (w + 1), d


def test_png_filters_all_five_types_present():
    """The encoder cycles filters r % 5 — the raw pre-compression
    stream must actually contain each filter tag (guards against the
    encoder silently writing all-zero filters, which would let a
    broken unfilter pass the roundtrip)."""
    import zlib

    png = mm.gen_png_gray8(17)
    w, h = mm._img_dims(17)
    # IDAT payload: skip signature + IHDR(25); chunk = len(4)+type(4)+data+crc(4)
    idat = png[8 + 25 + 8:-12 - 4]
    raw = zlib.decompress(idat)
    tags = {raw[r * (w + 1)] for r in range(h)}
    assert tags == {0, 1, 2, 3, 4}, tags


def test_bottom_up_row_order_detected():
    """A BMP written TOP-DOWN (wrong storage order) must decode to a
    different first_px than the formula's top-left pixel — i.e. the
    oracle would catch a decoder that ignores bottom-up order."""
    d = 5  # h=8, rows differ
    w, h, first, _ = _expected(d)
    good = mm.gen_bmp24(d)
    rowsz = ((3 * w + 3) // 4) * 4
    body = good[54:]
    flipped = good[:54] + b"".join(
        body[(h - 1 - r) * rowsz:(h - r) * rowsz] for r in range(h)
    )
    got = mm.decode_bmp24(flipped)
    assert got is not None and got[3] != first


def test_corrupt_image_falls_back_to_digest_path():
    import pandas as pd

    truncated_png = mm.gen_png_gray8(2)[:30]
    truncated_bmp = mm.gen_bmp24(1)[:40]
    batch = pd.DataFrame({
        "url": ["u1", "u2"],
        "html": [truncated_png, truncated_bmp],
    })
    out = next(mm.media_features_kernel(iter([batch])))
    for _, row in out.iterrows():
        assert row["width"] is None and row["luma_sum"] is None
        assert row["sha256"] is not None  # digest path taken
        assert row["media_kind"] == "image"  # magic still sniffs


def test_mixed_corpus_end_to_end(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    feats = mm.media_features(mm.synth_media_corpus(docs)).collect()
    assert len(feats) == docs.count()
    n_img = 0
    for r in feats:
        d = int(r["url"].rsplit("/", 1)[1])
        if d % 4 in (1, 2):
            n_img += 1
            w, h, first, lum = _expected(d)
            assert (r["width"], r["height"], r["first_px"], r["luma_sum"]) \
                == (w, h, first, lum), r
            assert r["channels"] == (3 if d % 4 == 1 else 1)
            assert r["sha256"] is None and r["feature"] is None
            assert r["media_kind"] == "image"
        else:
            assert r["width"] is None and r["sha256"] is not None
    assert n_img > 100
