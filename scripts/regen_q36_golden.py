#!/usr/bin/env python
"""Regenerate the q36 golden rows (searchgov_spider_spark/golden/
q36_pdf_golden.json) from the current PDF kernel + fixtures.

Run ONLY after a deliberate fixture/semantics change, then hand-verify the
diff — the golden file is the independent oracle for q36, so blindly
regenerating it after a kernel change defeats its purpose.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from searchgov_spider_spark.kernels import pdfx  # noqa: E402
from searchgov_spider_spark.queries import _pdf_fixture  # noqa: E402

rows = []
for i in range(64):
    url, pdf = _pdf_fixture(i)
    doc = pdfx.convert_pdf(pdf, url)
    rows.append(
        {
            "url": url,
            "title": doc["title"],
            "content": doc["content"],
            "n_links": len(doc["links"]),
            "created_at": doc["created_at"],
            "changed": doc["changed"],
        }
    )

out = os.path.join(
    os.path.dirname(__file__), "..", "searchgov_spider_spark", "golden", "q36_pdf_golden.json"
)
with open(out, "w") as f:
    json.dump(rows, f, indent=1)
print(f"wrote {len(rows)} golden rows to {out} — now hand-verify the diff")
