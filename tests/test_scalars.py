"""Byte-identity tests for scalar kernels P1-P11 vs the live reference.

Every kernel is compared one-to-one against the reference function on
(a) curated edge-case fixtures from FIXTURES.md §3 and (b) hypothesis
property fuzz over Danish-ish text. The reference module is imported
in-process (tests/oracle.py), so both sides see the same hash seed.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pdf_extractor2_spark.functions import scalars as k

# ---------------------------------------------------------------------------
# curated fixtures (FIXTURES.md §3 edge cases)
# ---------------------------------------------------------------------------

TEXT_SAMPLES = [
    "",
    " ",
    "a",
    "ab",
    "  Niels   Bohr \t Vej  ",
    "line one\n\n  \nline two",
    "NBSP spaced text",
    "ÆbleGrød MedFløde",
    "småHuse StoreHuse",
    "already Spaced Out",
    "a B cD eF",
    "xX",
    " xX",
    "A/S entreprisen påBegyndt",
    "Byggeri af 24 nyeRækkehuse iÅrhus",
    "Niels Bohr",
    "NIELS BOHR",
    "NIELS",
    "Niels bohr",
    "niels Bohr Hansen Jensen Petersen",
    "Jens-Peter Hansen",
    "Søren Ångstrøm",
    "Projektleder Hansen",
    "Mette O'Brien",
    "Bo Li",
    "X Æ A-12",
    "Jan F. 2023",
    "Telefon: 12 34 56 78",
    "+45 87 65 43 21 og 12345678",
    "cvr 12345678",
    "CVR: 12345678 men tlf 23 45 67 89",
    "org nr 87654321",
    "født 19850312",
    "ring 20304050",
    "år 2024 kostede 45678901",
    "12345678 87654321 12345678",
    "123456789",
    "1234567",
    "12-34-56-78",
    "12 34-56 78",
    "a@b.dk",
    "kontakt: jens@firma.dk og mette@byg.dk",
    "no mail here",
    "j.p.hansen+x@sub.domain.co.uk tekst",
    "budget 2,5 mio. kr",
    "2.5 mio kr og 1 mia",
    "3 billion kroner",
    "4,2 million",
    "pris 17 mio",
    "intet beløb",
    "maj 2024",
    "12 maj 2024",
    "okt. 2023",
    "3 okt. 2023",
    "12-05-2024",
    "12.05.2024",
    "12/05/2024",
    "2026",
    "1999",
    "den 5 januar 2025 og 7 feb 2026",
    "Region Hovedstaden",
    "hovedstaden småt",
    "Sjælland og Midtjylland",
    "Nordjylland",
    "ingen region",
    "Udførelsesproces i gang",
    "UDBUDSPROCES",
    "skitseprojekt afsluttet",
    "construction phase",
    "Projecting now",
    "intet stadie",
    "Handled. Steel contractor",
    "Project leader. Total contractor",
    "Projektleder. Totalentreprenør",
    "Handled. Purchaser",
    "Handled. Concrete element producer. Steel contractor",
    "Byggeleder. VVS entreprenør\nHandled. Murer",
    "Totalentreprenør og Hovedentreprenør og Jordentreprenør",
    "Projektleder for alt\nSagsansvarlig hos firma",
    "Niels Bohr\n12 34 56 78\nHandled. Painter",
    "manager of things. engineer of stuff",
    "head. chief designer",
    "Production manager. Delivery planner. Purchasers",
    "rolle: tagdækker og smed",
    "Projekteringsleder",
    "x. y. z",
    "a" * 120,
    ("Handled. " + "x" * 99),
    "indkøbere behøves ikke",
]


REF_FUNCS = [
    ("clean_text", "clean_text"),
    ("clean_multiline", "clean_multiline"),
    ("fix_camelcase_boundaries", "fix_camelcase_boundaries"),
    ("is_valid_person_name", "is_valid_person_name"),
    ("extract_phones", "extract_phones"),
    ("extract_emails", "extract_emails"),
    ("extract_budget", "extract_budget"),
    ("extract_date", "extract_date"),
    ("extract_region", "extract_region"),
    ("extract_stage", "extract_stage"),
    ("extract_roles_from_text", "extract_roles_from_text"),
]


@pytest.mark.parametrize("ours,theirs", REF_FUNCS)
def test_curated_parity(reference, ours, theirs):
    mine = getattr(k, ours)
    ref = getattr(reference, theirs)
    for sample in TEXT_SAMPLES:
        assert mine(sample) == ref(sample), f"{ours}({sample!r})"


# ---------------------------------------------------------------------------
# property fuzz: Danish-ish text
# ---------------------------------------------------------------------------

_danish_words = st.sampled_from(
    [
        "Projektleder", "Totalentreprenør", "budget", "mio", "kr", "maj",
        "2024", "12", "34", "56", "78", "Niels", "Bohr", "Hansen", "æble",
        "ÅRHUS", "Sjælland", "Udbud", "arkiv", "telefon", "cvr", "Handled",
        "contractor", "Steel", "leader", ".", "\n", "e@f.dk", "-", "+45",
        "A/S", "opførelse", "✓", "bæredygtighed", "12345678", "20240101",
    ]
)

_danish_text = st.lists(_danish_words, min_size=0, max_size=30).map(" ".join)

_raw_text = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z", "Cc")
    ),
    max_size=200,
)


@settings(max_examples=300, deadline=None)
@given(text=st.one_of(_danish_text, _raw_text))
def test_fuzz_parity(reference, text):
    for ours, theirs in REF_FUNCS:
        mine = getattr(k, ours)(text)
        ref = getattr(reference, theirs)(text)
        if ours == "extract_emails":
            # set-ordering compared as sets under fuzz; exact-order parity
            # is covered by in-process pinned-seed curated tests
            assert sorted(mine) == sorted(ref), f"{ours}({text!r})"
        else:
            assert mine == ref, f"{ours}({text!r})"
