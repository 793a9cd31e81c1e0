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


def test_codec_random_pixel_fuzz():
    """Roundtrip on RANDOM pixels and dims (not the corpus formula):
    hand-built PNG/BMP encodings with arbitrary content must decode to
    exactly the source pixels — guards against the decoders passing
    only because the synthesis formula hides a symmetric bug (e.g. a
    sign error that cancels under the linear pixel pattern)."""
    import random
    import struct
    import zlib

    rng = random.Random(99)
    for _ in range(60):
        w = rng.randrange(1, 40)
        h = rng.randrange(1, 25)
        px = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        total = sum(sum(r) for r in px)

        # PNG via the module's own filter encoder (monkey-build: reuse
        # gen path by patching the row source is overkill — build the
        # stream with the same filter cycle directly)
        raw = bytearray()
        prev = bytes(w)
        for r in range(h):
            line = bytes(px[r])
            ft = r % 5
            raw.append(ft)
            if ft == 0:
                flt = line
            elif ft == 1:
                flt = bytes((line[c] - (line[c - 1] if c else 0)) % 256
                            for c in range(w))
            elif ft == 2:
                flt = bytes((line[c] - prev[c]) % 256 for c in range(w))
            elif ft == 3:
                flt = bytes(
                    (line[c] - ((line[c - 1] if c else 0) + prev[c]) // 2) % 256
                    for c in range(w))
            else:
                flt = bytes(
                    (line[c] - mm._paeth(line[c - 1] if c else 0, prev[c],
                                         prev[c - 1] if c else 0)) % 256
                    for c in range(w))
            raw += flt
            prev = line
        comp = zlib.compressobj(rng.randrange(10))  # any level must decode
        idat = comp.compress(bytes(raw)) + comp.flush()
        png = (mm._PNG_SIG
               + mm._png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
               + mm._png_chunk(b"IDAT", idat)
               + mm._png_chunk(b"IEND", b""))
        assert mm.decode_png_gray8(png) == (w, h, 1, px[0][0], total), (w, h)

        # BMP24 bottom-up with padding, gray pixels
        rowsz = ((3 * w + 3) // 4) * 4
        hdr = (b"BM" + struct.pack("<IHHI", 54 + h * rowsz, 0, 0, 54)
               + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * rowsz,
                             0, 0, 0, 0))
        body = bytearray()
        for r in range(h - 1, -1, -1):
            for p in px[r]:
                body += bytes((p, p, p))
            body += b"\xab" * (rowsz - 3 * w)  # junk padding must be skipped
        bmp = hdr + bytes(body)
        assert mm.decode_bmp24(bmp) == (w, h, 3, px[0][0], total), (w, h)


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


def test_null_text_parity_features_and_frames(spark, tmp_path):
    """NULL-text documents (NULL html payload — F.concat semantics) must
    hash-match the DuckDB oracle in BOTH graded multimodal rows: the
    features row surfaces the NULL-payload doc as sentinel values
    ('' / -1 / 0 bytes) in both engines, and the frames row SKIPS it in
    both engines (round-5 review fix: the oracle previously emitted
    'html'/NULL columns for a row the kernel reported as all-NULL, and
    four NULL frame rows the kernel never produced)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as em
    from test_textstats_edge import _compare

    rows = [
        (0, "hello world " * 10),   # html branch
        (1, None),                  # features: BMP branch (text unused)
        (2, None),                  # features: PNG branch (text unused)
        (3, None),                  # html branch, NULL payload
        (4, ""),                    # html branch, empty text
        (7, None),                  # html branch, NULL payload
    ]
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    _compare(spark, str(tmp_path),
             em.multimodal_features(spark, str(tmp_path)),
             em.multimodal_features_sql())
    frames = em.multimodal_frames(spark, str(tmp_path))
    # frames wraps text as HTML for EVERY doc_id (no image synthesis),
    # so every NULL-text doc is skipped — in both engines
    assert {r["url"].rsplit("/", 1)[1] for r in frames.select("url").collect()} \
        == {"0", "4"}
    _compare(spark, str(tmp_path), frames, em.multimodal_frames_sql())
