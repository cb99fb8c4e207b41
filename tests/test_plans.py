"""Physical-plan audits: the plan we want, not just the first one that passed.

Asserts Catalyst actually gives us predicate pushdown, column pruning,
broadcast joins, TakeOrderedAndProject top-k, partial aggregation, and
JVM-only execution where no UDF should appear (SURVEY.md §4)."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark import queries as Q

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestScanEfficiency:
    def test_q06_predicate_pushdown_and_pruning(self, spark):
        plan = plan_of(Q.q06_revenue_forecast(spark, SF_DIR))
        assert "PushedFilters" in plan
        # shipdate/discount/quantity predicates reach the parquet scan
        assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:500]
        # column pruning: the scan must not read uninvolved columns
        read_schema = plan.split("ReadSchema", 1)[1][:400]
        assert "l_partkey" not in read_schema and "l_returnflag" not in read_schema

    def test_q17_token_stats_is_pure_jvm(self, spark):
        plan = plan_of(Q.q17_token_stats(spark, SF_DIR), "simple")
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "*(" in plan  # whole-stage-codegen'd stages

    def test_q16_dedup_single_shuffle_for_agg(self, spark):
        plan = plan_of(Q.q16_exact_dedup(spark, SF_DIR), "simple")
        # one hash-partitioning exchange for the groupBy; the self-join reuses it
        assert plan.count("Exchange hashpartitioning") <= 3


class TestJoinStrategies:
    def test_q02_broadcast_joins(self, spark):
        plan = plan_of(Q.q02_revenue_by_nation(spark, SF_DIR), "simple")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_q03_anti_join_broadcast(self, spark):
        plan = plan_of(Q.q03_customers_without_orders(spark, SF_DIR), "simple")
        assert "LeftAnti" in plan

    def test_dap_enrichment_broadcasts(self, spark):
        from searchgov_spider_spark import flows

        dap = spark.createDataFrame([("example.gov", 5)], "domain string, avg_daily_visits long")
        docs = spark.createDataFrame([("d", "example.gov")], "id string, domain_name string")
        plan = plan_of(flows.enrich_documents_with_dap(docs, dap), "simple")
        assert "BroadcastHashJoin" in plan


class TestAggsAndTopK:
    def test_q01_partial_aggregation(self, spark):
        plan = plan_of(Q.q01_pricing_summary(spark, SF_DIR), "simple")
        assert "partial_sum" in plan or "partial" in plan.lower()

    def test_q04_take_ordered(self, spark):
        plan = plan_of(Q.q04_top_customers(spark, SF_DIR), "simple")
        assert "TakeOrderedAndProject" in plan

    def test_q21_cosine_take_ordered_no_udf(self, spark):
        df = Q.q21_cosine_topk(spark, SF_DIR)
        plan = plan_of(df, "simple")
        # scoring is codegen'd lambda functions — no Python in the hot path
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestCrawlPlans:
    def test_admission_filters_stay_jvm_except_kernels(self, spark):
        """The admission chain may contain exactly the kernel UDFs
        (canonicalize/hash/robots) — everything else must be JVM-side."""
        from searchgov_spider_spark.crawl.frontier import apply_admission_filters
        from searchgov_spider_spark.crawl.reference_bfs import CrawlPolicy

        links = spark.createDataFrame(
            [("https://host0.example.gov/p1", 1, 0, 0)], "url string, depth int, parent_seq long, pos int"
        )
        policy = CrawlPolicy(allowed_domains=["example.gov"], depth_limit=5)
        df = apply_admission_filters(links, policy)
        plan = plan_of(df, "simple")
        # offsite/query/deny/depth filters are plain Filter nodes (JVM)
        assert "Filter" in plan
        # the fused admission kernel is exactly ONE Arrow round trip — the
        # old strip->canonicalize->host->hash chain compiled to 3-4 serial
        # ArrowEvalPython nodes (regression guard)
        assert plan.count("ArrowEvalPython") == 1

    def test_politeness_selection_no_global_sort(self, spark):
        from searchgov_spider_spark.crawl import politeness

        fr = spark.createDataFrame(
            [(f"u{i}", f"h{i%3}.gov", 1, i) for i in range(100)],
            "url_canon string, host string, depth int, seq long",
        )
        plan = plan_of(politeness.select_per_host_static(fr, None, default_budget=5), "simple")
        # per-host window, never a global (empty-partition) window sort
        assert "Window" in plan
        assert "SinglePartition" not in plan


def test_fetch_join_reuses_pages_partitioning(spark):
    """TableFetcher: the pages side is repartitioned+persisted once; the
    per-round join must not introduce a fresh exchange on the pages side."""
    from searchgov_spider_spark.crawl.fetch import TableFetcher
    from searchgov_spider_spark.synth import webgen
    from searchgov_spider_spark.synth.spark_gen import PAGES_SCHEMA

    pages = spark.createDataFrame(webgen.pages_pandas(200, 3), schema=PAGES_SCHEMA)
    fetcher = TableFetcher(pages, partitions=8)
    batch = spark.createDataFrame([(webgen.page_url(0, 0), 7)], "url_canon string, seq long")
    plan = plan_of(fetcher.fetch(batch), "simple")
    assert "InMemoryTableScan" in plan  # cached pages side
    fetcher.pages.unpersist()
