"""resolve_redirects (pointer jumping), host_boilerplate, allocate_budget
unit semantics."""

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators.curation import host_boilerplate
from searchgov_spider_spark.operators.graph import resolve_redirects
from searchgov_spider_spark.operators.urlmine import allocate_budget


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_redirects_chain_cycle_selfloop(spark):
    # 10->11->12->13 (terminal), 20<->21 (2-cycle), 30->30 (self-loop)
    e = _edges(spark, [(10, 11), (11, 12), (12, 13), (20, 21), (21, 20), (30, 30)])
    out = {r.src: r for r in resolve_redirects(e).collect()}
    assert (out[10].final_url, out[10].hops, out[10].status) == (13, 3, "resolved")
    assert (out[11].final_url, out[11].hops) == (13, 2)
    assert (out[12].final_url, out[12].hops) == (13, 1)
    for s in (20, 21, 30):
        assert out[s].status == "cycle"
        assert out[s].final_url is None and out[s].hops is None


def test_redirects_long_chain_within_doubling_budget(spark):
    # 40-hop chain: resolved by 6 doublings (2^6 = 64 >= 40)
    e = _edges(spark, [(i, i + 1) for i in range(100, 140)])
    out = {r.src: r for r in resolve_redirects(e).collect()}
    assert (out[100].final_url, out[100].hops, out[100].status) == (140, 40, "resolved")


def test_redirects_chain_beyond_budget_flagged(spark):
    # 5-hop chain with only 2 doublings (max 4 hops): flagged, not wrong
    e = _edges(spark, [(i, i + 1) for i in range(5)])
    out = {r.src: r for r in resolve_redirects(e, max_doublings=2).collect()}
    assert out[0].status == "cycle"  # unresolved-at-budget is reported, never a bogus target
    assert out[1].status == "resolved" and out[1].final_url == 5


def test_host_boilerplate_threshold(spark):
    rows = []
    for i in range(10):  # host A: banner on every doc -> share 1.0
        rows.append(("A", i, ["the banner", f"unique {i}"]))
    for i in range(10, 14):  # host B: only 4 docs -> min_docs gate
        rows.append(("B", i, ["the banner", f"u {i}"]))
    df = spark.createDataFrame(rows, "host string, doc_id long, lines array<string>")
    out = {(r.host, r.line): r for r in host_boilerplate(df, min_docs=10, min_share=0.3).collect()}
    a = out[("A", "the banner")]
    assert a.n_docs_with_line == 10 and a.share == 1.0 and a.boilerplate
    b = out[("B", "the banner")]
    assert b.n_docs_with_line == 4 and not b.boilerplate  # host too small
    # unique lines (n=1) are excluded from the output entirely
    assert ("A", "unique 0") not in out


def test_host_boilerplate_counts_docs_not_occurrences(spark):
    # the same line twice inside ONE doc counts once
    df = spark.createDataFrame(
        [("A", 1, ["x", "x"]), ("A", 2, ["x"])], "host string, doc_id long, lines array<string>"
    )
    r = host_boilerplate(df, min_docs=1, min_share=0.5).collect()[0]
    assert r.n_docs_with_line == 2 and r.host_docs == 2


def test_allocate_budget_hamilton_exact(spark):
    # classic largest-remainder case: quotas 33.33 / 33.33 / 33.33 at 100
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("c", 1.0)], "host string, score double"
    )
    out = {r.host: r.alloc for r in allocate_budget(df, budget=100).collect()}
    assert sorted(out.values()) == [33, 33, 34]
    assert out["a"] == 34  # tie on remainder broken by host name ascending
    assert sum(out.values()) == 100


def test_allocate_budget_sums_to_budget_and_is_proportional(spark):
    df = spark.createDataFrame(
        [(f"h{i}", float((i * 13) % 97 + 1)) for i in range(25)], "host string, score double"
    )
    rows = allocate_budget(df, budget=1000).collect()
    assert sum(r.alloc for r in rows) == 1000
    for r in rows:  # every allocation within 1 of its real quota
        assert abs(r.alloc - r.quota) < 1.0
