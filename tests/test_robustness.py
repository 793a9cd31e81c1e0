"""Adversarial payload robustness: mutated/truncated/garbage payloads
must always produce exactly one success-or-failure ROW — never an
exception out of the kernel (app.py:180-186 semantics at corpus scale)."""

from __future__ import annotations

import random

from pdf_extractor2_spark.plans.extract_job import _extract_one
from pdf_extractor2_spark.sources.corpus import make_doc_spec, render_payload


def _mutations(payload: bytes, rng: random.Random) -> list[bytes]:
    out = []
    n = len(payload)
    out.append(payload[: rng.randint(0, n)])                      # truncation
    cut = rng.randint(0, max(0, n - 10))
    out.append(payload[:cut] + payload[cut + rng.randint(1, 9):])  # deletion
    pos = rng.randint(0, max(0, n - 1))
    out.append(payload[:pos] + bytes([rng.randint(0, 255)]) + payload[pos + 1:])  # bitflip
    out.append(payload + payload[: rng.randint(0, n)])             # duplication
    out.append(bytes(rng.randint(0, 255) for _ in range(rng.randint(1, 300))))  # noise
    return out


def test_kernel_never_raises_on_mutated_payloads():
    rng = random.Random("robustness-r1")
    n_rows = 0
    for i in range(60):
        spec = make_doc_spec(i, seed=3, pdf_share=0.3)
        payload = render_payload(spec)
        if not payload:
            continue
        for mutant in _mutations(payload, rng):
            row = _extract_one(f"u{i}", mutant, 0)  # must not raise
            assert isinstance(row["success"], bool)
            assert row["success"] or row["error"]
            n_rows += 1
    assert n_rows > 200


def test_payload_size_cap():
    from pdf_extractor2_spark.plans import extract_job

    big = b"<html>" + b"x" * (extract_job.MAX_PAYLOAD_BYTES + 1)
    row = _extract_one("u-big", big, 0)
    assert row["success"] is False and "too large" in row["error"]


def test_decompression_bomb_becomes_failure_row():
    import zlib

    # a PDF whose content stream inflates from ~1 MB to ~1 GB
    bomb = zlib.compress(b"\x00" * (1024 * 1024 * 1024), 9)
    blob = (b"5 0 obj\n<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(bomb)
            + bomb + b"\nendstream\nendobj\n")
    from test_pdf import _minimal_pdf

    pdf = _minimal_pdf([blob], b"", 1, b"5 0 R")
    row = _extract_one("u-bomb", pdf, 0)
    assert row["success"] is False
    assert "bomb" in row["error"] or "bound" in row["error"]


def test_gzip_and_latin1_payload_variants():
    """The corpus carries gzip-wrapped and latin-1 HTML payloads; the
    kernel must transparently decode both (Danish chars intact)."""
    import gzip

    from pdf_extractor2_spark.plans.extract_job import payload_to_ir
    from pdf_extractor2_spark.sources.html_extract import decode_html_bytes

    html = ("<!DOCTYPE html><html><head><meta charset='iso-8859-1'>"
            "<title>Søren på Ærø</title></head><body><article>"
            "<p>Vi bygger rækkehuse i Åbenrå for 45 mio. kr</p>"
            "</article></body></html>")
    latin = html.encode("latin-1")
    assert "Søren på Ærø" in decode_html_bytes(latin)

    ir, _, kind = payload_to_ir(latin)
    assert kind == "html"
    assert "rækkehuse i Åbenrå" in ir.page_texts[0]

    gz = gzip.compress(html.encode("latin-1"))
    ir2, _, kind2 = payload_to_ir(gz)
    assert kind2 == "html"
    assert ir2.page_texts == ir.page_texts

    # gzip-wrapped PDFs work too
    from pdf_extractor2_spark.sources.corpus import make_doc_spec, render_payload

    spec = next(
        make_doc_spec(i, seed=11, pdf_share=0.9) for i in range(50)
        if make_doc_spec(i, seed=11, pdf_share=0.9).payload_kind == "pdf"
    )
    pdf_payload = render_payload(spec)
    ir3, _, k3 = payload_to_ir(gzip.compress(pdf_payload))
    assert k3 == "pdf" and ir3.page_texts


def test_gzip_bomb_becomes_failure_row():
    import gzip

    bomb = gzip.compress(b"\x00" * (300 * 1024 * 1024))
    row = _extract_one("u-gzbomb", bomb, 0)
    assert row["success"] is False and "bomb" in row["error"]


def test_truncated_gzip_becomes_failure_row():
    """A gzip stream cut off mid-flight decompresses to a partial
    document; d.eof is False and the row must fail, not half-succeed."""
    import gzip

    whole = gzip.compress(b"<html><body><p>" + b"hello world " * 2000 + b"</p></body></html>")
    truncated = whole[: len(whole) // 2]
    row = _extract_one("u-gztrunc", truncated, 0)
    assert row["success"] is False and "truncated" in row["error"]
