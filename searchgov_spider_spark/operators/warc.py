"""WARC segment source: Common-Crawl-style archives -> the input_hint page
table (url, warc_ts, html:binary, ...) as an Arrow-batched distributed scan.

At 100 TB the input is ~100k gzip WARC segment files of ~1 GB; the parallel
unit is the SEGMENT (one task inflates + parses one segment, streaming its
pages out as Arrow batches), so the operator is a pure map with zero
shuffles — partitioning comes from however the segment blobs were read
(spark.read.format("binaryFile") in production; any (segment_id, data)
DataFrame here).  Python-side work is unavoidable (gzip member inflation +
byte scanning — no JVM builtin), so it uses mapInPandas over Arrow batches,
the sanctioned slow-path shape, and emits only the projected columns.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels import warcx

PAGES_SCHEMA = (
    "segment_id long, url string, warc_date string, status int, "
    "mime string, n_bytes long, body binary"
)


def warc_pages(segments: DataFrame, id_col: str = "segment_id", data_col: str = "data") -> DataFrame:
    """Parse every WARC segment blob into its `response` pages.

    Input: any DataFrame with (``id_col``, ``data_col``: binary).  Output
    one row per response record: segment_id, url, warc_date, status, mime,
    n_bytes (body length), body.  warcinfo/request records are skipped by
    the kernel; gzip segments are sniffed per blob.
    """
    sel = segments.selectExpr(f"{id_col} as segment_id", f"{data_col} as data")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg_id, blob in zip(pdf["segment_id"], pdf["data"]):
                for rec in warcx.parse_warc(bytes(blob)):
                    rows.append(
                        (
                            int(seg_id),
                            rec["url"],
                            rec["date"],
                            rec["status"],
                            rec["mime"],
                            len(rec["body"]),
                            rec["body"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "segment_id", "url", "warc_date", "status", "mime", "n_bytes", "body",
                ],
            )

    return sel.mapInPandas(parse, PAGES_SCHEMA)
