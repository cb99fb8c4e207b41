#!/usr/bin/env python
"""Regenerate the q37 golden rows (searchgov_spider_spark/golden/
q37_sitemap_golden.json) from the current 4-method sitemap-discovery kernel
over the deterministic fixture.

Run ONLY after a deliberate fixture/semantics change, then hand-verify the
diff against the discovery spec (helpers.py analog — common locations,
robots ``Sitemap:`` directives, <link rel> hrefs, sitemap-named .xml hrefs
with confirmation) — the golden file is the independent oracle for q37, so
blindly regenerating it after a kernel change defeats its purpose.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from searchgov_spider_spark.kernels.sitemapxml import find_sitemaps  # noqa: E402
from searchgov_spider_spark.synth import webgen  # noqa: E402

N_HOSTS = 8
bases, res = webgen.sitemap_discovery_fixture(N_HOSTS)
rows = sorted((b, sm) for b in bases for sm in find_sitemaps(b, res))

out = os.path.join(
    os.path.dirname(__file__), "..", "searchgov_spider_spark", "golden", "q37_sitemap_golden.json"
)
with open(out, "w") as f:
    json.dump([{"base_url": b, "sitemap_url": sm} for b, sm in rows], f, indent=1)
print(f"wrote {len(rows)} golden rows to {out} — now hand-verify the diff")
