"""revisit_schedule (Cho & Garcia-Molina change-rate scheduling) and
url_templates (template mining / crawl-trap detection) unit semantics."""

import math
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators.temporal import revisit_schedule
from searchgov_spider_spark.operators.urlmine import url_templates


def _history(spark, rows):
    return spark.createDataFrame(rows, "url_id long, ts timestamp, changed boolean")


def _fetches(url_id, n, changed_flags, interval_days=10.0):
    t0 = datetime(2026, 1, 1)
    return [
        (url_id, t0 + timedelta(days=i * interval_days), bool(changed_flags[i]))
        for i in range(n)
    ]


def test_revisit_estimator_matches_closed_form(spark):
    # 5 visits, 2 changes, 10-day regular cadence
    df = _history(spark, _fetches(1, 5, [0, 1, 0, 1, 0]))
    row = revisit_schedule(df).collect()[0]
    assert row.n_visits == 5 and row.n_changes == 2
    assert row.interval_days == pytest.approx(10.0)
    r_hat = -math.log((5 - 2 + 0.5) / (5 + 0.5))
    lam = r_hat / 10.0
    assert row.lambda_per_day == pytest.approx(lam, abs=1e-6)
    assert row.next_fetch_days == pytest.approx(1.0 / lam, abs=1e-4)


def test_revisit_clamps_both_ends(spark):
    # never-changed URL: tiny lambda -> clamped at max_days
    stable = _fetches(1, 4, [0, 0, 0, 0], interval_days=30.0)
    # always-changed URL fetched hourly: huge lambda -> clamped at min_days
    churny = _fetches(2, 10, [1] * 10, interval_days=1.0 / 24.0)
    out = {r.url_id: r for r in revisit_schedule(_history(spark, stable + churny)).collect()}
    assert out[1].next_fetch_days == 365.0
    assert out[2].next_fetch_days == 1.0


def test_revisit_skips_single_visit_and_zero_span(spark):
    t0 = datetime(2026, 1, 1)
    rows = [(1, t0, True), (2, t0, False), (2, t0, True)]  # url 2: two visits, same instant
    assert revisit_schedule(_history(spark, rows)).count() == 0


def test_url_templates_collapse_share_and_trap(spark):
    rows = (
        # calendar trap: 40 generated day pages on one host
        [("trap.gov", f"/cal/2026/01/{d:02d}") for d in range(1, 41)]
        # same host, one static page
        + [("trap.gov", "/about")]
        # other host: two ids under one template
        + [("ok.gov", "/doc/7"), ("ok.gov", "/doc/8")]
    )
    df = spark.createDataFrame(rows, "host string, path string")
    out = {(r.host, r.template): r for r in url_templates(df, trap_threshold=30).collect()}
    trap = out[("trap.gov", "/cal/{n}/{n}/{n}")]
    assert trap.n_urls == 40 and trap.trap
    assert trap.host_share == pytest.approx(40 / 41, abs=1e-6)
    assert trap.sample_url == "trap.gov/cal/2026/01/01"
    about = out[("trap.gov", "/about")]
    assert about.n_urls == 1 and not about.trap
    ok = out[("ok.gov", "/doc/{n}")]
    assert ok.n_urls == 2 and ok.host_share == pytest.approx(1.0) and not ok.trap


def test_url_templates_broadcasts_host_total(spark):
    df = spark.createDataFrame([("h.gov", "/a/1")], "host string, path string")
    plan = url_templates(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


class TestShardPlan:
    def _pages(self, spark, rows):
        return spark.createDataFrame(rows, "url string")

    def test_balanced_and_skew_visible(self, spark):
        from searchgov_spider_spark.operators.urlmine import shard_plan

        # 4 uniform hosts x 10 URLs + one mega-host with 60 URLs:
        # total=100, n_shards=4 -> quantile width 25.  SURT order:
        # gov,aa < gov,bb < gov,mega < gov,yy < gov,zz
        rows = [(f"https://{h}.gov/p/{i}",) for h in ("aa", "bb", "yy", "zz") for i in range(10)]
        rows += [(f"https://mega.gov/p/{i}",) for i in range(60)]
        out = {r.shard_id: r for r in shard_plan(self._pages(spark, rows), n_shards=4).collect()}
        # cum_before: aa=0, bb=10, mega=20, yy=80, zz=90
        # shard = cum*4 div 100 -> aa:0, bb:0, mega:0, yy:3, zz:3
        assert set(out) == {0, 3}  # shards 1-2 skipped: mega's mass is indivisible
        assert out[0].n_urls == 80 and out[0].n_hosts == 3
        assert out[0].lo_host == "gov,aa" and out[0].hi_host == "gov,mega"
        assert out[3].n_urls == 20 and out[3].n_hosts == 2
        assert out[3].lo_host == "gov,yy" and out[3].hi_host == "gov,zz"

    def test_partition_invariant_and_total_mass(self, spark):
        from searchgov_spider_spark.operators.urlmine import shard_plan

        rows = [(f"https://h{i % 23}.example.gov/p/{i}",) for i in range(400)]
        base = sorted(
            tuple(r) for r in shard_plan(self._pages(spark, rows), n_shards=8).collect()
        )
        re_run = sorted(
            tuple(r)
            for r in shard_plan(
                self._pages(spark, rows).repartition(13), n_shards=8, num_partitions=3
            ).collect()
        )
        assert base == re_run  # BIGINT math: identical at any parallelism
        assert sum(r[4] for r in base) == 400  # every URL lands in exactly one shard
        ids = [r[0] for r in base]
        assert ids == sorted(ids) and ids[0] == 0  # monotone contiguous-range ids

    def test_empty_input(self, spark):
        from searchgov_spider_spark.operators.urlmine import shard_plan

        out = shard_plan(self._pages(spark, []), n_shards=4)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "shard_id", "lo_host", "hi_host", "n_hosts", "n_urls",
        ]
