"""Structured-Streaming tests: seed ingestion and windowed metrics."""

import json
import os

from searchgov_spider_spark.streaming import ingest


def test_stream_seed_ingestion(spark, tmp_path):
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    with open(seeds_dir / "batch1.json", "w") as f:
        for u in ["HTTPS://Host0.Example.GOV:443/#frag", "https://host1.example.gov/p1;jsessionid=ABC", "https://host0.example.gov/"]:
            f.write(json.dumps({"url": u, "output_target": "csv"}) + "\n")
    staging = str(tmp_path / "staging")
    q = ingest.stream_seed_ingestion(spark, str(seeds_dir), staging, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    out = spark.read.parquet(staging)
    rows = {r["url_canon"] for r in out.collect()}
    # alias collapses with the messy seed -> 2 distinct canonical urls
    assert rows == {"https://host0.example.gov/", "https://host1.example.gov/p1"}
    assert out.filter("url_hash is null").count() == 0

    # second drop: only genuinely new files are processed (stream checkpoint)
    with open(seeds_dir / "batch2.json", "w") as f:
        f.write(json.dumps({"url": "https://host2.example.gov/x", "output_target": "csv"}) + "\n")
    q2 = ingest.stream_seed_ingestion(spark, str(seeds_dir), staging, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    out2 = spark.read.parquet(staging)
    assert out2.count() == 3


def test_windowed_metrics_stream(spark, tmp_path):
    mdir = tmp_path / "metrics"
    mdir.mkdir()
    rows = [
        {"ts": "2024-01-01T00:00:10.000Z", "host": "a.gov", "status": "fetched"},
        {"ts": "2024-01-01T00:00:40.000Z", "host": "a.gov", "status": "fetched"},
        {"ts": "2024-01-01T00:01:10.000Z", "host": "b.gov", "status": "missed"},
    ]
    with open(mdir / "m1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    q = ingest.stream_fetch_metrics(spark, str(mdir), str(tmp_path / "ckpt2"), query_name="fm_test")
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["status"]): r["n"]
        for r in spark.sql("select * from fm_test").collect()
    }
    assert got[("2024-01-01 00:00:00", "fetched")] == 2
    assert got[("2024-01-01 00:01:00", "missed")] == 1
