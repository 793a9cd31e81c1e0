"""API-envelope parity (app.py:72-207 semantics re-expressed as library
calls; the reference's FastAPI layer itself is not importable here — no
fastapi in the container — so the envelope rules are asserted
structurally against the app.py recipe)."""

from __future__ import annotations

import json

import pytest

from pdf_extractor2_spark.plans.batch_api import extract_batch, extract_single
from pdf_extractor2_spark.sources.corpus import make_doc_spec, render_payload


def _files(n=12, seed=21):
    files = []
    for i in range(n):
        spec = make_doc_spec(i, seed=seed, pdf_share=0.3)
        ext = ".pdf" if spec.payload_kind == "pdf" else ".html"
        files.append((f"doc{i}{ext}", render_payload(spec)))
    return files


def test_single_envelope():
    name, payload = next((n, p) for n, p in _files() if p)
    result = extract_single(payload, name)
    assert result["metadata"] == {"filename": name, "success": True}
    inner = json.loads(result["raw_json"])
    assert inner["metadata"] == result["metadata"]
    assert "raw_json" not in inner  # self-embedding excludes raw_json itself
    assert list(result["summary"]) == ["contacts", "projects", "tenders"]


def test_single_rejects_bad_extension():
    with pytest.raises(ValueError):
        extract_single(b"x", "notes.txt")


def test_batch_envelope_and_summary():
    files = _files() + [("bad.txt", b"x"), ("empty.pdf", None)]
    resp = extract_batch(files)
    assert resp["summary"]["total"] == len(files)
    assert resp["summary"]["successful"] + resp["summary"]["failed"] == len(files)
    # invalid extension and empty payload are failure rows, not exceptions
    by_name = {
        r.get("filename") or r.get("metadata", {}).get("filename"): r
        for r in resp["results"]
    }
    assert by_name["bad.txt"] == {
        "filename": "bad.txt", "success": False, "error": "Invalid file type"
    }
    assert by_name["empty.pdf"]["success"] is False
    # batch raw_json re-serializes the whole response (excluding itself)
    outer = json.loads(resp["raw_json"])
    assert outer["summary"] == resp["summary"]
    # totals count successful files only (app.py:198-200)
    total_contacts = sum(
        r["summary"]["contacts"]
        for r in resp["results"]
        if r.get("metadata", {}).get("success")
    )
    assert resp["summary"]["total_contacts"] == total_contacts
