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
