"""Large randomized live-reference parity campaign: N random documents
(pages from the fuzz line pool + random grids), engine parse_document vs
the reference pipeline in-process, raw_json byte identity per case."""
import json
import random
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pdf_extractor2_spark.operators.document import (
    CandidateTable, DocumentIR, parse_document, result_with_raw_json,
)
from pdf_extractor2_spark.operators.grids import normalize_grid
from oracle import OracleDocument, load_reference, run_reference

N = int(sys.argv[1]) if len(sys.argv) > 1 else 25000
rng = random.Random(31337)

LINES = [
    "KONTAKTER", "PROJEKTER", "UDBUD", "OPLYSNINGER", "Kontakter",
    "Navn Telefon Rolle", "Niels Bohr 12 34 56 78 Projektleder",
    "Mette Hansen 87 65 43 21 Handled. Murer",
    "Opførelse af huse 45 mio. kr maj 2024", "Renovering 2,5 mia",
    "ByggeData A/S", "CVR: 12345678", "Telefon: 33 44 55 66",
    "info@byggedata.dk", "https://x.dk", "Id nr: 9", "tom linje", "",
    "Jens Madsen", "11 22 33 44", "Handled. Tagdækker", "arkiv",
    "CONTACTS", "Hubexo", "Udbud af beton arkiv", "nan", "None",
    "Etablering af p-plads 12 mio", "Ombygning af kontor Aarhus",
    "Anders And  Tlf: 99 88 77 66", "Entreprenør: NCC",
]
CELLS = [
    "Niels Bohr", "12 34 56 78", "Projektleder", "Navn", "Telefon",
    "Rolle", "", None, "nan", "None", "Opførelse af huse", "45 mio. kr",
    "maj 2024", "Hovedstaden", "Totalentreprenør", "udbud", "arkiv",
    "info@x.dk", "ByggeData A/S", "2,5 mia", "Beton", "Murer",
    "Projekt navn", "Budget", "Region", "Dato", "Stage", "licitation",
]

load_reference()

def rand_page():
    return "\n".join(rng.choice(LINES) for _ in range(rng.randint(0, 15)))

def rand_grid():
    rows = rng.randint(1, 6)
    cols = rng.randint(1, 6)
    return [[rng.choice(CELLS) for _ in range(cols)] for _ in range(rows)]

mismatch = 0
for i in range(N):
    pages = [rand_page() for _ in range(rng.randint(0, 3))]
    grids = [rand_grid() for _ in range(rng.randint(0, 3))]
    tables = [
        CandidateTable(grid=normalize_grid(g), page=j + 1, method="lattice",
                       accuracy=95.0)
        for j, g in enumerate(grids)
    ]
    ir = DocumentIR(page_texts=pages, lattice_tables=tables)
    mine = parse_document(ir)
    theirs = run_reference(
        OracleDocument(
            page_texts=list(ir.page_texts),
            lattice=[(t.grid, t.page, t.accuracy) for t in ir.lattice_tables],
        )
    )
    enveloped = result_with_raw_json(mine, "case.pdf")
    theirs = dict(theirs)
    theirs["metadata"] = {"filename": "case.pdf", "success": True}
    theirs["raw_json"] = json.dumps(theirs, ensure_ascii=False)
    if enveloped["raw_json"] != theirs["raw_json"] or enveloped != theirs:
        mismatch += 1
        if mismatch <= 3:
            print(f"MISMATCH case {i}")
            print("pages:", pages)
            print("grids:", grids)
    if (i + 1) % 5000 == 0:
        print(f"{i + 1}/{N} done, {mismatch} mismatches", flush=True)

print(f"RESULT {N} cases, {mismatch} mismatches")
