"""Unit tests for the politeness token bucket (dynamic + static paths)."""

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.crawl import politeness


@pytest.fixture()
def frontier(spark):
    rows = []
    seq = 0
    for host, n in (("a.gov", 10), ("b.gov", 3), ("hot.gov", 50)):
        for i in range(n):
            rows.append((f"https://{host}/p{i}", host, 1, seq))
            seq += 1
    return spark.createDataFrame(rows, "url_canon string, host string, depth int, seq long")


class TestDynamicBucket:
    def test_refill_caps_at_capacity(self, spark):
        hs = spark.createDataFrame(
            [("a.gov", 1.0, 5.0, 0.0), ("slow.gov", 2.0, 5.0, 0.0)],
            "host string, crawl_delay double, tokens double, last_refill_s double",
        )
        out = {r["host"]: r for r in politeness.refill_tokens(hs, now_s=100.0, capacity_s=10.0).collect()}
        # capacity = 10s / delay; refill = min(cap, tokens + elapsed/delay)
        assert out["a.gov"]["tokens"] == 10.0
        assert out["slow.gov"]["tokens"] == 5.0
        assert out["a.gov"]["last_refill_s"] == 100.0

    def test_spend_subtracts_and_floors(self, spark):
        hs = spark.createDataFrame(
            [("a.gov", 1.0, 5.0, 0.0)], "host string, crawl_delay double, tokens double, last_refill_s double"
        )
        counts = spark.createDataFrame([("a.gov", 9)], "host string, fetched_count int")
        out = politeness.spend_tokens(hs, counts).collect()[0]
        assert out["tokens"] == 0.0

    def test_init_uses_robots_crawl_delay(self, spark, frontier):
        robots = spark.createDataFrame(
            [("a.gov", "User-agent: *\nCrawl-delay: 4\nDisallow: /x\n"), ("b.gov", "User-agent: *\nDisallow:\n")],
            "host string, rules_text string",
        )
        out = {r["host"]: r for r in politeness.init_host_state(frontier, robots, now_s=0.0).collect()}
        assert out["a.gov"]["crawl_delay"] == 4.0
        assert out["b.gov"]["crawl_delay"] == politeness.DEFAULT_CRAWL_DELAY
        assert out["hot.gov"]["crawl_delay"] == politeness.DEFAULT_CRAWL_DELAY

    def test_select_per_host_dynamic(self, spark, frontier):
        hs = spark.createDataFrame(
            [("a.gov", 1.0, 4.0, 0.0), ("b.gov", 1.0, 0.0, 0.0), ("hot.gov", 1.0, 2.0, 0.0)],
            "host string, crawl_delay double, tokens double, last_refill_s double",
        )
        got = politeness.select_per_host(frontier, hs, salt_buckets=4).collect()
        by_host = {}
        for r in got:
            by_host.setdefault(r["host"], []).append(r["seq"])
        assert len(by_host.get("a.gov", [])) == 4
        assert "b.gov" not in by_host
        assert len(by_host["hot.gov"]) == 2
        # FIFO: lowest seq first
        assert sorted(by_host["a.gov"]) == by_host["a.gov"]
        assert by_host["a.gov"] == [0, 1, 2, 3]


class TestStaticEquivalence:
    def test_static_budget_matches_steady_state_bucket(self, spark, frontier):
        """With capacity == round length the dynamic bucket refills to the cap
        every round, so per-round selection must equal the static budget path."""
        robots = spark.createDataFrame(
            [("a.gov", "User-agent: *\nCrawl-delay: 2\nDisallow: /zzz\n")], "host string, rules_text string"
        )
        round_s = 8.0
        budgets = politeness.static_budgets(robots, round_s)
        static_sel = politeness.select_per_host_static(frontier, budgets, default_budget=int(round_s))
        hs = politeness.init_host_state(frontier, robots, now_s=0.0)
        hs = politeness.refill_tokens(hs, now_s=round_s, capacity_s=round_s)
        dyn_sel = politeness.select_per_host(frontier, hs)
        assert sorted(r["seq"] for r in static_sel.collect()) == sorted(r["seq"] for r in dyn_sel.collect())

    def test_salted_equals_unsalted(self, spark, frontier):
        budgets = None
        a = politeness.select_per_host_static(frontier, budgets, default_budget=5, salt_buckets=1)
        b = politeness.select_per_host_static(frontier, budgets, default_budget=5, salt_buckets=8)
        assert sorted(r["seq"] for r in a.collect()) == sorted(r["seq"] for r in b.collect())


class TestPropertyCanonicalize:
    def test_hypothesis_idempotent_and_stable(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from searchgov_spider_spark.kernels.urlnorm import canonicalize_url, url_seen_hash

        host_st = st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
        path_st = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}", fullmatch=True)
        query_st = st.lists(
            st.tuples(st.from_regex(r"[a-z]{1,5}", fullmatch=True), st.from_regex(r"[A-Za-z0-9]{0,6}", fullmatch=True)),
            max_size=4,
        )

        @settings(max_examples=200, deadline=None)
        @given(host=host_st, path=path_st, query=query_st, frag=st.sampled_from(["", "#x", "#sec-2"]),
               scheme=st.sampled_from(["http", "https", "HTTP", "HTTPS"]), upper=st.booleans())
        def check(host, path, query, frag, scheme, upper):
            qs = "&".join(f"{k}={v}" for k, v in query)
            h = host.upper() if upper else host
            url = f"{scheme}://{h}{path}" + (f"?{qs}" if qs else "") + frag
            c1 = canonicalize_url(url)
            # idempotent
            assert canonicalize_url(c1) == c1
            # fragment-free, lowercase scheme+host
            assert "#" not in c1
            assert c1.startswith(("http://", "https://"))
            # alias with shuffled-case host collapses to same hash
            assert url_seen_hash(canonicalize_url(url.replace(h, h.upper()))) == url_seen_hash(c1)

        check()
