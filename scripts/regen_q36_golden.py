#!/usr/bin/env python
"""Regenerate the q36 golden rows (searchgov_spider_spark/golden/
q36_pdf_golden.json) from the current PDF kernel + fixtures.

Since round 5 the regen is SELF-CHECKING (round-4 ADVICE: record the
hand-verification): before writing, every row's PDF-specific fields are
re-derived INDEPENDENTLY of the PDF parser — straight from the fixture
PARAMETERS (_pdf_fixture's text lines / TJ kern rule / hex & Differences
lines / annot URIs / D: date strings), never by reading PDF bytes — and
any disagreement with the kernel-extracted row aborts the regen.  Only the
content/description ASSEMBLY reuses audited helpers (sanitize_text,
separate_filename), which have their own byte-parity tests; the parsing
under test contributes nothing to the expectation.

Still hand-verify the diff after a deliberate fixture/semantics change —
the golden file is the independent oracle for q36.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from searchgov_spider_spark.kernels import pdfx  # noqa: E402
from searchgov_spider_spark.kernels.textproc import sanitize_text  # noqa: E402
from searchgov_spider_spark.kernels.urlnorm import separate_filename  # noqa: E402
from searchgov_spider_spark.queries import _pdf_fixture  # noqa: E402


def expected_row(i: int) -> dict:
    """Fixture-parameter mirror of _pdf_fixture(i) -> expected q36 fields,
    independent of the PDF parser."""
    url = f"https://host0.example.gov/docs/AnnualReport{i}.pdf"
    filename = f"AnnualReport{i}.pdf"
    frags = [
        f"Annual report number {i}.",
        f"See https://host0.example.gov/ref{i} for data.",
    ]
    if i % 3 == 0:
        # TJ kern rule: -30 concatenates, -250 (<= -180) reads as a space
        frags.append(f"Section {i}")
    if i % 6 == 1:
        frags.append(f"Unicode appendix {i}.")
    if i % 6 == 4:
        frags.append(f"Résumé — année {i} déposée.")
    text = " ".join(frags)
    links = [
        f"https://host0.example.gov/annot{i}",  # /Annots first
        f"https://host0.example.gov/ref{i}",  # then visible-text URLs
    ]
    title = created = changed = None
    if i % 4 == 0:
        title = f"FY{2000 + i} Annual Report"
        created = f"2024-01-1{i % 10}T12:00:00"
        changed = f"2024-02-1{i % 10}T08:00:00"
    elif i % 8 == 6:
        title = f"Xref Stream Report {i}"
        # the fixture's D:2024030{i%10}... has day 0{i%10}: day 00 (i%10==0)
        # is not a real date, so date parsing must yield None for it
        created = f"2024-03-0{i % 10}T09:00:00" if i % 10 != 0 else None
    title_sep = title if title is not None else separate_filename(filename)
    content = " ".join(
        x for x in (title_sep, filename, f"{sanitize_text(text)} {' '.join(links)}".strip()) if x
    )
    return {
        "url": url,
        "title": title if title is not None else f"AnnualReport{i}",
        "content": content,
        "n_links": len(links),
        "created_at": created,
        "changed": changed,
    }


rows = []
mismatches = []
for i in range(64):
    url, pdf = _pdf_fixture(i)
    doc = pdfx.convert_pdf(pdf, url)
    row = {
        "url": url,
        "title": doc["title"],
        "content": doc["content"],
        "n_links": len(doc["links"]),
        "created_at": doc["created_at"],
        "changed": doc["changed"],
    }
    want = expected_row(i)
    if row != want:
        mismatches.append((i, row, want))
    rows.append(row)

if mismatches:
    for i, got, want in mismatches[:5]:
        print(f"MISMATCH fixture {i}:\n  kernel      = {got}\n  independent = {want}", file=sys.stderr)
    raise SystemExit(
        f"{len(mismatches)} rows disagree between the kernel extraction and the "
        "fixture-parameter derivation — fix whichever side regressed; golden NOT rewritten"
    )

out = os.path.join(
    os.path.dirname(__file__), "..", "searchgov_spider_spark", "golden", "q36_pdf_golden.json"
)
with open(out, "w") as f:
    json.dump(rows, f, indent=1)
print(f"wrote {len(rows)} golden rows to {out} (kernel == fixture-parameter derivation)")
