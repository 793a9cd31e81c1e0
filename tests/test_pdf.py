"""From-scratch PDF writer/reader round-trip (FIXTURES.md §1b) and
kernel byte-identity on PDF payloads."""

from __future__ import annotations

import json

import pytest

from pdf_extractor2_spark.plans.extract_job import payload_to_ir
from pdf_extractor2_spark.sources.corpus import DocSpec, make_doc_spec
from pdf_extractor2_spark.sources.pdf_reader import PdfDocument, extract_pdf
from pdf_extractor2_spark.sources.pdf_writer import render_pdf

from oracle import OracleDocument, run_reference


def _spec(idx: int, **kw) -> DocSpec:
    from datetime import datetime, timezone

    base = dict(
        idx=idx,
        url=f"https://x.dk/doc/{idx}",
        warc_ts=datetime(2025, 1, 1, tzinfo=timezone.utc),
        lang="da",
        payload_kind="pdf",
    )
    base.update(kw)
    return DocSpec(**base)


SIMPLE = _spec(
    0,
    title="t",
    company_lines=["ByggeData A/S", "CVR: 12345678", "Telefon: 33 44 55 66"],
    paragraphs=["Oversigt over projekter."],
)

WITH_TABLE = _spec(
    1,
    company_lines=["Nordbyg ApS", "CVR: 87654321"],
    tables=[[
        ["#", "Navn", "Telefon", "Email", "Rolle"],
        ["1", "Niels Bohr", "12 34 56 78", "niels@inst.dk", "Projektleder"],
        ["2", "Mette Hansen", "87 65 43 21", "mette@byg.dk", "Handled. Murer"],
        ["3", "Jens Madsen", "23 45 67 89", "jens@x.dk", "Byggeleder"],
    ]],
)

MULTILINE_CELL = _spec(
    2,
    tables=[[
        ["#", "Navn", "Telefon", "Rolle"],
        ["1", "Niels Bohr", "12 34 56 78\n98 76 54 32", "Projektleder"],
        ["2", "Mette Hansen", "11 22 33 44", "Handled. Maler"],
    ]],
)

DANISH_CHARS = _spec(
    3,
    company_lines=["Møller & Søn A/S", "CVR: 11223344"],
    paragraphs=["Bæredygtighed ✓ på Ærø i Åbenrå"],
)


@pytest.mark.parametrize("spec", [SIMPLE, WITH_TABLE, MULTILINE_CELL, DANISH_CHARS],
                         ids=["simple", "table", "multiline", "danish"])
@pytest.mark.parametrize("variant", [0, 1], ids=["classic-xref", "xref-stream"])
def test_text_roundtrip(spec, variant):
    """Every written text line must come back, in order, in page text —
    for both the classic-xref/raw and xref-stream/ObjStm/Flate variants."""
    spec = _spec(spec.idx * 2 + variant, title=spec.title,
                 company_lines=spec.company_lines, paragraphs=spec.paragraphs,
                 section_lines=spec.section_lines, tables=spec.tables)
    payload = render_pdf(spec)
    assert payload[:5] == b"%PDF-"
    parsed = extract_pdf(payload)
    text = "\n".join(parsed.page_texts)
    for line in spec.company_lines + spec.paragraphs + spec.section_lines:
        assert line in text, line
    for grid in spec.tables:
        for row in grid:
            for cell in row:
                for part in str(cell).split("\n"):
                    if part:
                        assert part in text, part


def test_document_structure():
    payload = render_pdf(WITH_TABLE)
    doc = PdfDocument(payload)
    assert len(doc.pages()) >= 1


def test_table_recovery():
    parsed = extract_pdf(render_pdf(WITH_TABLE))
    grids = [g for tables in parsed.stream_tables_by_config for g, _, _ in tables]
    grids += [g for g, _, _ in parsed.lattice_tables]
    # at least one profile must recover the 4x5 structure
    assert any(len(g) == 4 and len(g[0]) == 5 for g in grids), grids


def test_multiline_cell_becomes_continuation_row():
    parsed = extract_pdf(render_pdf(MULTILINE_CELL))
    ir, spans, kind = payload_to_ir(render_pdf(MULTILINE_CELL))
    assert kind == "pdf"
    # the second phone must survive somewhere in the IR
    flat = json.dumps([t.grid for t in ir.lattice_tables]) + json.dumps(
        [[t.grid for t in cfg] for t in [] ]
    ) + json.dumps([[t.grid for t in cfg] for cfg in ir.stream_tables_by_config])
    assert "98 76 54 32" in flat


@pytest.mark.parametrize("idx", range(0, 40))
def test_kernel_parity_on_corpus_pdfs(reference, idx):
    """Engine vs reference on PDF corpus docs (in-process, seed-shared)."""
    spec = make_doc_spec(idx, seed=11, pdf_share=0.9)
    if spec.payload_kind != "pdf":
        pytest.skip("not a pdf row")
    payload = render_pdf(spec)
    ir, spans, kind = payload_to_ir(payload)
    from pdf_extractor2_spark.operators.document import parse_document

    mine = parse_document(ir)
    theirs = run_reference(
        OracleDocument(
            page_texts=list(ir.page_texts),
            lattice=[(t.grid, t.page, t.accuracy) for t in ir.lattice_tables],
            stream_by_config={
                i: [(t.grid, t.page, t.accuracy) for t in tables]
                for i, tables in enumerate(ir.stream_tables_by_config)
            },
            plumber_tables=[],
        )
    )
    assert mine == theirs
