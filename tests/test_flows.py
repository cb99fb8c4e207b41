"""Tests for ancillary flows: sitemap delta, freshness, DAP, sinks, config
validation — each against a hand-computed or pure-Python oracle."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark import flows
from searchgov_spider_spark.synth import webgen


class TestSitemapDelta:
    def test_delta_matches_generator(self, spark):
        snaps = spark.createDataFrame(webgen.sitemap_snapshots_pandas(5))
        out = flows.sitemap_delta(snaps).collect()
        # generator adds pages 4 and 5 per sitemap in the second snapshot
        got = {(r["sitemap_url"], r["page_url"]) for r in out}
        expected = {
            (f"https://{webgen.host_name(h)}/sitemap.xml", webgen.page_url(h, k))
            for h in range(3)
            for k in (4, 5)
        }
        assert got == expected

    def test_no_previous_snapshot_all_new(self, spark):
        snaps = spark.createDataFrame(
            [("s", "u1", dt.datetime(2024, 1, 1)), ("s", "u2", dt.datetime(2024, 1, 1))],
            "sitemap_url string, page_url string, snapshot_ts timestamp",
        )
        assert flows.sitemap_delta(snaps).count() == 2


class TestFreshness:
    def test_dispositions(self, spark):
        docs = spark.createDataFrame(
            [("a", "https://h.gov/alive"), ("b", "https://h.gov/dead")], "id string, url string"
        )
        pages = spark.createDataFrame([("https://h.gov/alive",)], "url string")
        out = {r["id"]: r for r in flows.freshness_check(docs, pages).collect()}
        assert out["a"]["status_code"] == 200 and out["a"]["disposition"] == "ok"
        assert not out["a"]["marked_for_deletion"]
        assert out["b"]["status_code"] == 404 and out["b"]["disposition"] == "marked_for_deletion"
        assert out["b"]["marked_for_deletion"]

    def test_max_results(self, spark):
        docs = spark.createDataFrame([(str(i), f"https://h.gov/{i}") for i in range(10)], "id string, url string")
        pages = spark.createDataFrame([("https://h.gov/0",)], "url string")
        assert flows.freshness_check(docs, pages, max_results=3).count() == 3


class TestDap:
    def test_transform_filters_and_sums(self, spark):
        raw = spark.createDataFrame(
            [
                ("WWW.Example.GOV", 20240101, 10),
                ("example.gov", 20240101, 5),       # merges with the row above
                ("(not set)", 20240101, 7),
                ("12.34", 20240101, 7),
                (".gov", 20240101, 7),
                ("localhost", 20240101, 7),
                ("other.gov", 20240102, 3),
            ],
            "domain string, date int, visits int",
        )
        out = {(r["domain"], r["date"]): r["visits"] for r in flows.dap_transform(raw).collect()}
        assert out == {("example.gov", 20240101): 15, ("other.gov", 20240102): 3}

    def test_avg_daily_and_enrichment(self, spark):
        dap = spark.createDataFrame(
            [("example.gov", 20240101 + i, 28) for i in range(28)], "domain string, date int, visits long"
        )
        avg = flows.dap_avg_daily_visits(dap, anchor_date=20240131, days_back=28)
        assert avg.collect()[0]["avg_daily_visits"] == 28
        docs = spark.createDataFrame(
            [("d1", "www.example.gov"), ("d2", "unknown.gov")], "id string, domain_name string"
        )
        enriched = {r["id"]: r["dap_domain_visits_count"] for r in flows.enrich_documents_with_dap(docs, avg).collect()}
        assert enriched == {"d1": 28, "d2": None}


class TestSinks:
    def test_urls_csv_rotation(self, spark, tmp_path):
        df = spark.createDataFrame([(f"https://h.gov/{i}",) for i in range(100)], "url string").coalesce(1)
        path = str(tmp_path / "urls")
        flows.write_urls_csv(df, path, max_records_per_file=30)
        import glob

        files = glob.glob(f"{path}/part-*")
        assert len(files) >= 4  # 100/30 -> rotated into >= 4 files
        lines = sum(1 for f in files for _ in open(f))
        assert lines == 100

    def test_urls_out_prunes_heavy_columns(self, spark):
        df = spark.createDataFrame([("u", "c", "b")], "url string, content string, content_type string")
        assert set(flows.urls_out(df).columns) == {"url"}

    def test_http_endpoint_sink_batching_and_close_flush(self, spark, tmp_path):
        """S10 POST sink semantics (pipelines.py:130-191): URLs batch per
        partition until the utf-8 byte total reaches the threshold (checked
        after each append), the partition-end remainder flushes like
        close_spider, payloads are {"urls": [...]}, and there is NO retry."""
        import json
        import os

        calls = tmp_path / "calls"
        calls.mkdir()
        cdir = str(calls)

        def _recording_factory():
            import json as _json
            import os as _os
            import time as _time

            def transport(api_url, urls, timeout_s):
                assert api_url == "https://api.example.gov/urls"
                payload = _json.dumps({"urls": urls})  # the reference's POST body
                with open(_os.path.join(cdir, f"{_time.monotonic_ns()}"), "w") as f:
                    f.write(payload)
                return 200

            return transport

        # 24-byte URLs, threshold 96 -> flush after every 4th append
        urls = [(f"https://h.gov/u{i:09d}",) for i in range(10)]
        df = spark.createDataFrame(urls, "url string").coalesce(1)
        sink = flows.HttpEndpointSink(
            "https://api.example.gov/urls",
            transport_factory=lambda: _recording_factory(),
            max_batch_bytes=96,
        )
        receipts = sink.post_urls(df).collect()
        assert [(r["n_urls"], r["n_bytes"], r["ok"]) for r in
                sorted(receipts, key=lambda r: r["batch_seq"])] == [
            (4, 96, True), (4, 96, True), (2, 48, True)]  # remainder flushed at close
        posted = []
        for f in sorted(os.listdir(cdir)):
            posted.extend(json.load(open(os.path.join(cdir, f)))["urls"])
        assert posted == [u for (u,) in urls]  # order preserved, one POST per batch

    def test_http_endpoint_sink_failed_batch_dropped_no_retry(self, spark, tmp_path):
        """A failing POST drops that batch and clears the buffer (the
        DropItem path) — later batches still send, and the transport is
        called exactly once per batch."""
        import os

        calls = tmp_path / "fail_calls"
        calls.mkdir()
        cdir = str(calls)

        def _flaky_factory():
            import os as _os
            import time as _time

            state = {"n": 0}

            def transport(api_url, urls, timeout_s):
                open(_os.path.join(cdir, f"{_time.monotonic_ns()}_{len(urls)}"), "w").close()
                state["n"] += 1
                if state["n"] == 1:
                    raise ConnectionError("endpoint down")
                return 200

            return transport

        urls = [(f"https://h.gov/u{i:09d}",) for i in range(10)]
        df = spark.createDataFrame(urls, "url string").coalesce(1)
        sink = flows.HttpEndpointSink(
            "https://api.example.gov/urls",
            transport_factory=lambda: _flaky_factory(),
            max_batch_bytes=96,
        )
        receipts = sorted(sink.post_urls(df).collect(), key=lambda r: r["batch_seq"])
        assert [(r["n_urls"], r["ok"], r["status"]) for r in receipts] == [
            (4, False, None), (4, True, 200), (2, True, 200)]
        assert len(os.listdir(cdir)) == 3  # exactly one transport call per batch

    def test_content_type_filter(self, spark):
        df = spark.createDataFrame(
            [("a", "text/html; charset=utf-8"), ("b", "application/pdf"), ("c", "image/png"), ("d", "text/plain")],
            "id string, content_type string",
        )
        os_ids = {r["id"] for r in flows.filter_by_content_type(df, "opensearch").collect()}
        csv_ids = {r["id"] for r in flows.filter_by_content_type(df, "csv").collect()}
        assert os_ids == {"a", "b"}
        assert csv_ids == {"a", "b", "d"}


class TestSeedsValidation:
    def test_violations(self, spark):
        rows = [
            ("ok", "h.gov", "https://h.gov/", "csv", 3),
            ("ok", "h.gov", "https://h.gov/", "csv", 3),          # duplicate name
            ("bad-depth", "h.gov", "https://h.gov/", "csv", 300),
            ("bad-target", "h.gov", "https://h.gov/", "nope", 3),
            ("bad-url", "h.gov", "x", "endpoint", 3),
        ]
        seeds = spark.createDataFrame(
            rows, "name string, allowed_domains string, starting_urls string, output_target string, depth_limit int"
        )
        v = {(r["value"], r["violation"]) for r in flows.validate_seeds(seeds).collect()}
        assert ("ok", "duplicate_name") in v
        assert ("bad-depth", "depth_out_of_bounds") in v
        assert ("bad-target", "invalid_output_target") in v
        assert ("bad-url", "invalid_starting_urls") in v

    def test_clean_seeds_pass(self, spark):
        from searchgov_spider_spark.synth.spark_gen import generate_support_tables

        seeds = generate_support_tables(spark, 5)["seeds"]
        assert flows.validate_seeds(seeds).count() == 0


def test_spider_id_shape():
    sid = flows.spider_id("a", "b", "c")
    assert len(sid) == 10
    assert sid == flows.spider_id("a", "b", "c")
    assert sid != flows.spider_id("a", "b", "d")


class TestFreshnessExceptions:
    def test_exception_struct_routing(self, spark):
        from searchgov_spider_spark import flows

        pages = spark.createDataFrame([("https://h0.gov/a",)], "url string")
        docs = spark.createDataFrame(
            [("d1", "https://h0.gov/a"), ("d2", "https://h0.gov/gone"), ("d3", "https://h0.gov/timeout")],
            "id string, url string",
        )
        exc = spark.createDataFrame(
            [("d3", "TimeoutError", "Connection timed out")],
            "id string, exception_type string, exception_message string",
        )
        out = {r["id"]: r for r in flows.freshness_check(docs, pages, exceptions=exc).collect()}
        # ok row (reference would drop it from output; we keep the 'ok' disposition)
        assert out["d1"]["status_code"] == 200 and out["d1"]["result"] == "200"
        assert out["d1"]["exception"] is None and not out["d1"]["marked_for_deletion"]
        # 404 -> marked for deletion, result is the status string (items.py:92-99)
        assert out["d2"]["disposition"] == "marked_for_deletion" and out["d2"]["marked_for_deletion"]
        assert out["d2"]["result"] == "404"
        # exception -> null status, result = exception type, struct populated,
        # NOT marked for deletion (items.py:112-119, freshness_spider.py:130-143)
        assert out["d3"]["status_code"] is None
        assert out["d3"]["result"] == "TimeoutError"
        assert out["d3"]["exception"]["exception_type"] == "TimeoutError"
        assert out["d3"]["exception"]["exception_message"] == "Connection timed out"
        assert not out["d3"]["marked_for_deletion"]
        assert out["d3"]["disposition"] == "exception"


class TestDapPaging:
    def test_paged_fetch_stops_on_empty_page(self):
        from searchgov_spider_spark import flows

        feed = [[{"domain": f"d{i}.gov", "date": "20240101", "visits": str(i)} for i in range(3)],
                [{"domain": "late.gov", "date": "20240101", "visits": "7"}],
                []]
        calls = []

        def fetch_page(page, limit):
            calls.append((page, limit))
            return feed[page - 1] if page <= len(feed) else []

        rows = flows.dap_paged_fetch(fetch_page, limit=1000)
        assert len(rows) == 4
        # pages are 1-based and the loop continues past a SHORT page, stopping
        # only on the first EMPTY page (dap/connect.py:27-68)
        assert calls == [(1, 1000), (2, 1000), (3, 1000)]

    def test_dap_ingest_end_to_end(self, spark):
        from searchgov_spider_spark import flows

        def fetch_page(page, limit):
            if page == 1:
                return [
                    {"domain": "WWW.Agency.GOV", "date": "20240102", "visits": "10"},
                    {"domain": "agency.gov", "date": "20240102", "visits": "5"},
                    {"domain": "(not set)", "date": "20240102", "visits": "9"},
                ]
            return []

        out = flows.dap_ingest(spark, fetch_page).collect()
        assert len(out) == 1  # www-stripped merge + invalid dropped
        assert out[0]["domain"] == "agency.gov" and out[0]["visits"] == 15


class TestMonitors:
    def test_thresholds(self):
        from searchgov_spider_spark.crawl.monitors import MonitorSettings, run_monitors

        res = {m["monitor"]: m for m in run_monitors(
            items_scraped=10,
            status_counts={200: 100, 500: 51, 404: 1000},
            finish_reason="finished",
            elapsed_seconds=10.0,
        )}
        assert res["item_count"]["passed"]
        assert not res["unwanted_http_codes"]["passed"]   # 500 over max-count 50
        assert "500" in res["unwanted_http_codes"]["detail"]
        assert res["execution_time"]["passed"]
        assert res["finish_reason"]["passed"]
        # 404 is NOT in the unwanted list (settings/domain_spider.py:78)
        ok = {m["monitor"]: m for m in run_monitors(5, {404: 1000}, "finished", 1.0)}
        assert ok["unwanted_http_codes"]["passed"]
        strict = MonitorSettings(min_items=6, max_execution_time_s=0.5, expected_finish_reasons=("finished",))
        bad = {m["monitor"]: m for m in run_monitors(5, {}, "max_rounds", 1.0, strict)}
        assert not bad["item_count"]["passed"]
        assert not bad["execution_time"]["passed"]
        assert not bad["finish_reason"]["passed"]

    def test_monitors_from_run(self):
        from searchgov_spider_spark.crawl.monitors import monitors_from_run

        metrics = [
            {"fetched": 10, "missed": 1, "round_wall_s": 2.0, "stop": False},
            {"fetched": 4, "missed": 0, "round_wall_s": 1.0, "stop": True},
        ]
        res = {m["monitor"]: m for m in monitors_from_run(metrics)}
        assert all(m["passed"] for m in res.values())
        assert "items_scraped=14" in res["item_count"]["detail"]

    def test_status_code_counts_distributed(self, spark):
        from searchgov_spider_spark.crawl.monitors import status_code_counts

        df = spark.createDataFrame([(200,)] * 5 + [(404,)] * 2 + [(500,)], "status_code int")
        assert status_code_counts(df) == {200: 5, 404: 2, 500: 1}


class TestSortedPersistence:
    def test_snapshot_written_in_sorted_url_order(self, spark, tmp_path):
        """O7 (sitemap_monitor.py:186-189,:334): snapshot files hold sorted
        URLs, batched; reading files back in name order yields the global
        sorted sequence."""
        import glob
        import random

        from searchgov_spider_spark import flows

        urls = [f"https://h.gov/p{i:04d}" for i in range(97)]
        shuffled = urls[:]
        random.Random(3).shuffle(shuffled)
        snap = spark.createDataFrame([(u,) for u in shuffled], "page_url string").repartition(8)
        out = str(tmp_path / "snap")
        flows.write_sitemap_snapshot(snap, out, batch_size=20)

        import pyarrow.parquet as pq

        files = sorted(glob.glob(out + "/part-*"))
        per_file = [pq.read_table(f).column("page_url").to_pylist() for f in files]
        for vals in per_file:
            assert vals == sorted(vals) and len(vals) <= 20
        flat = [u for vals in per_file for u in vals]
        assert flat == sorted(urls)  # file sequence is globally sorted
