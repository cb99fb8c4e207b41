"""Loopback HTTP integration: the REAL network transports (stdlib urllib
fallback of crawl.fetch._default_transport_factory, and the urllib POST
transport of flows.HttpEndpointSink) exercised end-to-end against a stdlib
``http.server`` on 127.0.0.1 — no external network, no fakes (VERDICT r4
#5: the production paths previously ran only under injected transports).

The server runs threads in the TEST process; Spark's local-mode Python
workers reach it over loopback TCP, so captured request state is directly
assertable here.
"""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from searchgov_spider_spark.crawl.fetch import FetchPolicy, HttpFetcher, _default_transport_factory
from searchgov_spider_spark.flows import HttpEndpointSink


class _Handler(BaseHTTPRequestHandler):
    posts: list[tuple[str, bytes]] = []

    def log_message(self, *args):  # keep pytest output clean
        pass

    def do_GET(self):
        if self.path.startswith("/page/"):
            body = f"<html><body>page {self.path} <a href='/page/next'>n</a></body></html>".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Language", "en-US, en")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/slow":
            time.sleep(3.0)  # well past the test policy's timeout
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"ok")
        elif self.path == "/big":
            body = b"x" * 32_768  # past the test policy's 10 KB cap
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length", "0")))
        _Handler.posts.append((self.path, body))
        if self.path == "/api500":
            self.send_error(500)
            return
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()


@pytest.fixture(scope="module")
def server():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
    finally:
        httpd.shutdown()


def test_http_fetcher_real_transport_loopback(spark, server):
    """The default (urllib fallback) transport end-to-end through
    HttpFetcher's mapInPandas: 200s return body + Content-Language lang,
    while timeout / oversize / 404 each yield the Scrapy-downloader-miss
    shape (html NULL, lang NULL, no retry)."""
    urls = [
        f"{server}/page/a",
        f"{server}/page/b",
        f"{server}/slow",
        f"{server}/big",
        f"{server}/missing",
    ]
    fetcher = HttpFetcher(
        policy=FetchPolicy(timeout_s=1.0, max_bytes=10_240),
    )
    df = spark.createDataFrame([(u,) for u in urls], "url_canon string")
    rows = {r["url_canon"]: r for r in fetcher.fetch(df).collect()}
    assert rows[f"{server}/page/a"]["html"] is not None
    assert b"page /page/a" in bytes(rows[f"{server}/page/a"]["html"])
    assert rows[f"{server}/page/a"]["lang"] == "en-US"
    assert rows[f"{server}/page/b"]["html"] is not None
    for miss in ("/slow", "/big", "/missing"):
        assert rows[f"{server}{miss}"]["html"] is None, miss
        assert rows[f"{server}{miss}"]["lang"] is None, miss


def test_post_sink_real_transport_loopback(spark, server):
    """The default urllib POST transport end-to-end through
    HttpEndpointSink: real POSTs hit the loopback endpoint with the
    reference's ``{"urls": [...]}`` body shape, batch boundaries at the
    byte threshold, the close-time remainder flush, and a 500 endpoint
    dropping its batch (ok=False) with no retry."""
    _Handler.posts.clear()
    urls = [f"https://h.gov/u{i:04d}" for i in range(40)]
    sink = HttpEndpointSink(f"{server}/api", max_batch_bytes=400, timeout_s=5.0)
    df = spark.createDataFrame([(u,) for u in urls], "url string").coalesce(1)
    receipts = sink.post_urls(df).collect()
    assert all(r["ok"] and r["status"] == 200 for r in receipts)
    assert sum(r["n_urls"] for r in receipts) == 40
    assert len(receipts) >= 2  # threshold flush(es) + close-time remainder
    bodies = [json.loads(b) for p, b in _Handler.posts if p == "/api"]
    assert [u for b in bodies for u in b["urls"]] == urls
    assert all(set(b) == {"urls"} for b in bodies)
    # per-batch byte accounting matches the flush threshold rule: every
    # non-final batch crossed 400 bytes ON the append that triggered it
    for r in receipts[:-1]:
        assert r["n_bytes"] >= 400

    _Handler.posts.clear()
    bad = HttpEndpointSink(f"{server}/api500", max_batch_bytes=10_000, timeout_s=5.0)
    receipts = bad.post_urls(df.limit(3)).collect()
    assert len(receipts) == 1 and not receipts[0]["ok"]
    assert len([1 for p, _ in _Handler.posts if p == "/api500"]) == 1  # no retry
