"""SURT keys + CDX capture index (operators/urlmine.surt_col / cdx_index)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from searchgov_spider_spark.operators import urlmine


class TestSurt:
    CASES = [
        ("https://news.example.com/a?b=1", "com,example,news)/a?b=1"),
        ("https://EXAMPLE.com/Path/File.html", "com,example)/Path/File.html"),
        ("http://example.com", "com,example)/"),
        ("https://a.b.c.d.gov/x/y", "gov,d,c,b,a)/x/y"),
    ]

    def test_known_keys(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in self.CASES], ["url"])
        got = [r[0] for r in df.select(urlmine.surt_col("url")).collect()]
        assert got == [s for _, s in self.CASES]

    def test_host_urls_contiguous_under_byte_sort(self, spark):
        # the point of SURT: one registered domain's subdomains sort together
        urls = [
            "https://b.example.com/1",
            "https://zzz.other.org/x",
            "https://a.example.com/2",
            "https://example.com/3",
        ]
        df = spark.createDataFrame([(u,) for u in urls], ["url"])
        keys = sorted(r[0] for r in df.select(urlmine.surt_col("url")).collect())
        example = [k for k in keys if k.startswith("com,example")]
        assert keys.index(example[-1]) - keys.index(example[0]) == len(example) - 1


class TestCdxIndex:
    def test_sorted_within_partitions_and_range_partitioned(self, spark):
        rows = [
            (f"https://h{i % 7}.example.com/p/{i}", f"2024-01-{i % 28 + 1:02d}", i)
            for i in range(500)
        ]
        pages = spark.createDataFrame(rows, ["url", "warc_date", "doc_id"])
        idx = urlmine.cdx_index(pages, extra_cols=("doc_id",))
        # every partition is internally sorted AND partitions are ranges:
        # concatenating them in partition order yields the global sort
        parts = idx.rdd.glom().collect()
        flat = []
        for part in parts:
            keys = [(r["surt"], r["ts"]) for r in part]
            assert keys == sorted(keys)
            flat.extend(keys)
        nonempty = [p for p in parts if p]
        bounds = [((p[0]["surt"], p[0]["ts"]), (p[-1]["surt"], p[-1]["ts"])) for p in nonempty]
        for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
            assert hi1 <= lo2
        assert sorted(flat) == flat and len(flat) == 500

    def test_plan_is_range_exchange(self, spark):
        pages = spark.createDataFrame(
            [("https://a.example.com/x", "2024", 1)], ["url", "warc_date", "doc_id"]
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            urlmine.cdx_index(pages).explain("formatted")
        plan = buf.getvalue()
        assert "rangepartitioning" in plan.lower()
        assert "hashpartitioning" not in plan.lower()
