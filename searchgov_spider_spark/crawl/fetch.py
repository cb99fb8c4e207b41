"""Pluggable fetch stage (SURVEY.md §2.1 S4 / §2.3 J4).

The reference downloads over HTTP (Scrapy downloader, 15s/15MB bounds).  In
Spark the fetch stage is a DataFrame -> DataFrame operator appending
``html:binary`` and ``lang:string`` to the politeness-selected batch
(null html == fetch miss / 404):

  * ``TableFetcher`` — resolves URLs against a pages table via a join whose
    big side is partitioned once on the key.  Right shape for re-processing
    a stored corpus (WARC/CommonCrawl re-crawls), but costs a corpus scan
    per round.
  * ``GeneratorFetcher`` — the live-crawl shape: a ``mapInPandas`` batch
    client whose cost is proportional to the BATCH, not the corpus.  In
    production the body of ``_fetch_batch`` is an async HTTP client pool
    (bounded per-partition concurrency, 15s timeout, 15MB cap, no retry per
    settings/common.py:22-27); in this sandbox it "fetches" from the
    deterministic synthetic web by reconstructing pages from the URL
    (webgen.build_page is a pure function of the URL), which models network
    fetch cost-behavior exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import udfs


class TableFetcher:
    """Fetch = left join against a canonical-keyed pages table."""

    def __init__(self, pages: DataFrame, partitions: int):
        self.pages = (
            pages.withColumn("url_canon", udfs.canonicalize_url(F.col("url")))
            .select("url_canon", "html", "lang")
            .repartition(partitions, "url_canon")
            .persist()
        )
        self.pages.count()  # materialize once

    def fetch(self, selected: DataFrame) -> DataFrame:
        return selected.join(self.pages, "url_canon", "left")


class GeneratorFetcher:
    """Live-fetch shape: per-partition batch client over the synthetic web."""

    def __init__(self, n_pages: int, n_hosts: int, branch: int = 3):
        from ..synth import webgen

        self.sizes = webgen.host_sizes(n_pages, n_hosts)
        self.n_hosts = n_hosts
        self.branch = branch

    def fetch(self, selected: DataFrame) -> DataFrame:
        from ..synth import webgen

        sizes, n_hosts, branch = self.sizes, self.n_hosts, self.branch
        out_schema = T.StructType(
            list(selected.schema.fields)
            + [T.StructField("html", T.BinaryType()), T.StructField("lang", T.StringType())]
        )

        def _fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # production: open an async HTTP session here, fan out the batch
            for pdf in batches:
                htmls: list[bytes | None] = []
                langs: list[str | None] = []
                for url in pdf["url_canon"]:
                    hk = webgen.url_to_hk(url)
                    if hk is None or hk[0] >= n_hosts or hk[1] >= sizes[hk[0]]:
                        htmls.append(None)
                        langs.append(None)
                        continue
                    h, k = hk
                    row = webgen.build_page(h, k, sizes[h], n_hosts, branch, with_text=False)
                    htmls.append(row["html"])
                    langs.append(row["lang"])
                yield pdf.assign(html=pd.Series(htmls, index=pdf.index, dtype=object),
                                 lang=pd.Series(langs, index=pdf.index, dtype=object))

        return selected.mapInPandas(_fetch_batch, schema=out_schema)
