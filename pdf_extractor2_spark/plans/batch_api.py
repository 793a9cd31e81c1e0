"""Reference API-envelope semantics as a library face.

The reference serves extraction over HTTP (app.py: POST /extract,
POST /extract-batch).  This module reproduces those response envelopes —
metadata, self-embedded raw_json, batch summary totals, per-file error
capture — so a reference user can swap endpoints for these calls (or for
the distributed batch runner, which is the same envelope per corpus row).

Envelope rules replicated exactly:
  * single (app.py:97-120): result + metadata{filename, success:true} +
    raw_json = json.dumps(result incl. metadata, ensure_ascii=False);
  * invalid extension (app.py:149-155): {filename, success:false,
    error:'Invalid file type'} — batch only; single raises ValueError
    (the HTTP 400 analogue);
  * per-file failure (app.py:180-186): {filename, success:false,
    error:str(exc)} row, processing continues;
  * batch summary (app.py:188-201): totals over successful files only,
    keyed off metadata.success;
  * batch raw_json (app.py:205): the whole batch response re-serialized.
"""

from __future__ import annotations

import json

from ..operators.document import parse_document, result_with_raw_json
from .extract_job import payload_to_ir


def extract_single(payload: bytes, filename: str) -> dict:
    """POST /extract analogue. Raises on invalid input (HTTP 400/500)."""
    if not filename.endswith(".pdf") and not filename.endswith(".html"):
        raise ValueError("Invalid file type. Only PDF files are supported.")
    ir, _, _ = payload_to_ir(payload)
    return result_with_raw_json(parse_document(ir), filename)


def extract_batch(files: list[tuple[str, bytes | None]]) -> dict:
    """POST /extract-batch analogue: per-file success/error rows, batch
    summary, batch-level raw_json."""
    results: list[dict] = []
    for filename, payload in files:
        if not filename.endswith(".pdf") and not filename.endswith(".html"):
            results.append(
                {"filename": filename, "success": False, "error": "Invalid file type"}
            )
            continue
        try:
            ir, _, _ = payload_to_ir(payload)
            results.append(result_with_raw_json(parse_document(ir), filename))
        except Exception as exc:
            results.append(
                {"filename": filename, "success": False, "error": str(exc)}
            )

    successful = [r for r in results if r.get("metadata", {}).get("success")]
    failed = [r for r in results if not r.get("metadata", {}).get("success")]

    batch_response = {
        "results": results,
        "summary": {
            "total": len(files),
            "successful": len(successful),
            "failed": len(failed),
            "total_contacts": sum(
                r.get("summary", {}).get("contacts", 0) for r in successful
            ),
            "total_projects": sum(
                r.get("summary", {}).get("projects", 0) for r in successful
            ),
            "total_tenders": sum(
                r.get("summary", {}).get("tenders", 0) for r in successful
            ),
        },
    }
    batch_response["raw_json"] = json.dumps(batch_response, ensure_ascii=False)
    return batch_response
