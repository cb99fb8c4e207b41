"""WARC segment writer/parser kernel + the mapInPandas page source.

The q119 oracle pins the end-to-end formula parity on the sf corpus; these
tests pin the kernel's record-level behaviors (skipping non-response
records, gzip member inflation, byte-exact bodies, malformed payloads) and
the operator's zero-shuffle plan."""

import gzip
import io
from contextlib import redirect_stdout

from searchgov_spider_spark.kernels import warcx
from searchgov_spider_spark.operators import warc as warcop

PAGES = [
    {
        "url": "https://a.example.gov/x",
        "date": "2024-02-03T04:05:06Z",
        "status": 200,
        "mime": "text/html",
        "body": "<html>héllo</html>".encode("utf-8"),
    },
    {
        "url": "https://a.example.gov/missing",
        "date": "2024-02-03T04:05:07Z",
        "status": 404,
        "mime": "text/plain",
        "body": b"not here",
    },
    {
        "url": "https://a.example.gov/empty",
        "date": "2024-02-03T04:05:08Z",
        "status": 200,
        "mime": "application/pdf",
        "body": b"",
    },
]


class TestKernel:
    def _check(self, parsed):
        assert len(parsed) == len(PAGES)
        for got, want in zip(parsed, PAGES):
            assert got["url"] == want["url"]
            assert got["date"] == want["date"]
            assert got["status"] == want["status"]
            assert got["mime"] == want["mime"]
            assert got["body"] == want["body"]  # byte-exact, incl. multibyte

    def test_round_trip_plain(self):
        seg = warcx.build_warc_segment(PAGES)
        self._check(list(warcx.parse_warc(seg)))

    def test_round_trip_gzip_members(self):
        seg = warcx.build_warc_segment(PAGES, gzip_per_record=True)
        assert seg[:2] == b"\x1f\x8b"
        self._check(list(warcx.parse_warc(seg)))

    def test_request_and_warcinfo_records_skipped(self):
        seg = warcx.build_warc_segment(PAGES, with_requests=True)
        # segment physically contains 1 + 2*len(PAGES) records
        assert seg.count(b"WARC-Type: request") == len(PAGES)
        assert seg.count(b"WARC-Type: warcinfo") == 1
        assert len(list(warcx.parse_warc(seg))) == len(PAGES)

    def test_payload_without_http_head(self):
        raw = b"just bytes, no HTTP head"
        rec = warcx._record(
            "response",
            [
                ("WARC-Record-ID", "<urn:uuid:x>"),
                ("WARC-Date", "2024-01-01T00:00:00Z"),
                ("WARC-Target-URI", "https://x/raw"),
                ("Content-Type", "application/octet-stream"),
            ],
            raw,
        )
        got = list(warcx.parse_warc(rec))
        assert len(got) == 1
        assert got[0]["status"] == 0
        assert got[0]["body"] == raw

    def test_truncated_segment_stops_cleanly(self):
        seg = warcx.build_warc_segment(PAGES)
        assert list(warcx.parse_warc(seg[: len(seg) // 2]))  # no raise

    def test_body_containing_record_delimiters(self):
        # a body that CONTAINS "\r\n\r\nWARC/1.0" must not desync the scan
        # (Content-Length framing, not pattern search)
        tricky = b"x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\ny"
        pages = [dict(PAGES[0], body=tricky)] + PAGES[1:]
        got = list(warcx.parse_warc(warcx.build_warc_segment(pages)))
        assert len(got) == len(pages)
        assert got[0]["body"] == tricky


class TestOperator:
    def test_pages_from_segments(self, spark):
        seg_plain = warcx.build_warc_segment(PAGES, segment_name="s0")
        seg_gz = warcx.build_warc_segment(PAGES, segment_name="s1", gzip_per_record=True)
        df = spark.createDataFrame(
            [(0, bytearray(seg_plain)), (1, bytearray(seg_gz))],
            "segment_id long, data binary",
        )
        rows = warcop.warc_pages(df).orderBy("segment_id", "url").collect()
        assert len(rows) == 2 * len(PAGES)
        by_seg = {}
        for r in rows:
            by_seg.setdefault(r["segment_id"], []).append(r)
        for seg_id in (0, 1):
            urls = {r["url"] for r in by_seg[seg_id]}
            assert urls == {p["url"] for p in PAGES}
            for r in by_seg[seg_id]:
                want = next(p for p in PAGES if p["url"] == r["url"])
                assert bytes(r["body"]) == want["body"]
                assert r["n_bytes"] == len(want["body"])
                assert r["status"] == want["status"]

    def test_zero_shuffles(self, spark):
        df = spark.createDataFrame(
            [(0, bytearray(warcx.build_warc_segment(PAGES)))],
            "segment_id long, data binary",
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            warcop.warc_pages(df).explain("formatted")
        assert "Exchange" not in buf.getvalue()
