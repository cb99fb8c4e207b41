"""WARC 1.0 segment writer/parser (pure stdlib) — the Common-Crawl input
format the north rule's "Common-Crawl-style web pages" table is distributed
in (ISO 28500; reference ingests live HTTP via Scrapy, but a 100-TB Spark
run reads crawl archives: one ~1 GB WARC segment per task).

Subset implemented (the shape CC-MAIN segments actually use):
  - records: warcinfo / request / response; only `response` carries pages
  - per-record headers terminated by CRLFCRLF, payload of exactly
    Content-Length bytes, record terminated by CRLFCRLF
  - response payload = full HTTP/1.1 message (status line, headers, CRLF,
    body) — status / Content-Type / body are re-parsed from it
  - optional per-record gzip members (how Common Crawl ships segments):
    the parser sniffs the 0x1f8b magic and inflates member-by-member

The writer exists for fixtures/synthesis (deterministic: fixed record ids,
gzip mtime=0); the parser is the production path wrapped by
operators/warc.py as an Arrow-batched mapInPandas source.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

CRLF = b"\r\n"


def _record(warc_type: str, headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = [f"WARC/1.0"]
    head.append(f"WARC-Type: {warc_type}")
    head.extend(f"{k}: {v}" for k, v in headers)
    head.append(f"Content-Length: {len(payload)}")
    return (
        CRLF.join(h.encode("utf-8") for h in head)
        + CRLF * 2
        + payload
        + CRLF * 2
    )


def build_warc_segment(
    pages: list[dict],
    segment_name: str = "seg-00000",
    gzip_per_record: bool = False,
    with_requests: bool = True,
) -> bytes:
    """Serialize ``pages`` (dicts with url, date, status, mime, body:bytes,
    and optional http_headers) as one WARC segment: a warcinfo record, then
    optionally a request record (which a page reader must SKIP) and a
    response record per page.  Deterministic: record ids derive from the
    segment name + index, gzip members use mtime=0."""
    records: list[bytes] = []
    info = b"software: searchgov-spider-spark synthetic\r\nformat: WARC File Format 1.0\r\n"
    records.append(
        _record(
            "warcinfo",
            [
                ("WARC-Record-ID", f"<urn:uuid:{segment_name}-info>"),
                ("WARC-Date", "2024-01-01T00:00:00Z"),
                ("Content-Type", "application/warc-fields"),
            ],
            info,
        )
    )
    for i, p in enumerate(pages):
        if with_requests:
            req = (
                f"GET {p['url']} HTTP/1.1\r\nHost: x\r\nUser-Agent: synthetic\r\n\r\n"
            ).encode("utf-8")
            records.append(
                _record(
                    "request",
                    [
                        ("WARC-Record-ID", f"<urn:uuid:{segment_name}-req-{i}>"),
                        ("WARC-Date", p["date"]),
                        ("WARC-Target-URI", p["url"]),
                        ("Content-Type", "application/http;msgtype=request"),
                    ],
                    req,
                )
            )
        body = p["body"]
        status = p.get("status", 200)
        mime = p.get("mime", "text/html")
        http = (
            f"HTTP/1.1 {status} {'OK' if status == 200 else 'X'}\r\n"
            f"Content-Type: {mime}; charset=utf-8\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("utf-8") + body
        records.append(
            _record(
                "response",
                [
                    ("WARC-Record-ID", f"<urn:uuid:{segment_name}-rsp-{i}>"),
                    ("WARC-Date", p["date"]),
                    ("WARC-Target-URI", p["url"]),
                    ("Content-Type", "application/http;msgtype=response"),
                ],
                http,
            )
        )
    if gzip_per_record:
        return b"".join(
            gzip.compress(r, compresslevel=6, mtime=0) for r in records
        )
    return b"".join(records)


def _gunzip_members(data: bytes) -> bytes:
    """Inflate concatenated gzip members (per-record gzip, the CC layout)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data[pos:])
        out += d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # pragma: no cover - corrupt trailer guard
            break
        pos += consumed
    return bytes(out)


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield one dict per `response` record: url, date, status, mime, body
    (payload bytes after the HTTP head).  Tolerant of unknown record types
    (skipped by Content-Length), missing HTTP heads (whole payload treated
    as body, status 0), and per-record gzip segments."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(CRLF * 2, pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            return
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        length = int(hdrs.get("content-length", "0"))
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length + 4  # record terminator CRLFCRLF
        if hdrs.get("warc-type") != "response":
            continue
        http_end = payload.find(CRLF * 2)
        status = 0
        mime = ""
        body = payload
        if http_end >= 0 and payload[:5] == b"HTTP/":
            http_head = payload[:http_end].decode("utf-8", "replace")
            body = payload[http_end + 4 :]
            hlines = http_head.split("\r\n")
            parts = hlines[0].split(" ", 2)
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for ln in hlines[1:]:
                k, _, v = ln.partition(":")
                if k.strip().lower() == "content-type":
                    mime = v.strip().split(";")[0].strip()
        yield {
            "url": hdrs.get("warc-target-uri", ""),
            "date": hdrs.get("warc-date", ""),
            "status": status,
            "mime": mime,
            "body": body,
        }
