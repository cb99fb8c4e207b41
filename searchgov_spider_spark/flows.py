"""Ancillary crawl flows (SURVEY.md §3.2-3.3 + §2 operators U1, F13-F14,
J1-J2, A1-A2, S9, S13, F5, F10/S2).

Each flow is a small DataFrame job reusing the engine's kernels — the Spark
rebuild of the reference's sitemap monitor, freshness spider, DAP extractor,
URL sinks, and crawl-config validation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import udfs

# --- sitemap delta (U1; sitemaps/sitemap_monitor.py:260-290) -----------------


def sitemap_delta(snapshots: DataFrame) -> DataFrame:
    """New URLs per sitemap: latest snapshot EXCEPT previous snapshot.

    Input: (sitemap_url, page_url, snapshot_ts).  Output one row per newly
    appeared URL with the snapshot it appeared in (reference: ``new_urls =
    current - previous``, sitemap_monitor.py:283).
    """
    ts_rank = F.dense_rank().over(
        Window.partitionBy("sitemap_url").orderBy(F.desc("snapshot_ts"))
    )
    ranked = snapshots.withColumn("_rk", ts_rank)
    latest = ranked.filter(F.col("_rk") == 1).select("sitemap_url", "page_url", "snapshot_ts")
    previous = ranked.filter(F.col("_rk") == 2).select("sitemap_url", "page_url")
    return latest.join(previous, ["sitemap_url", "page_url"], "left_anti").select(
        "sitemap_url", "page_url", F.col("snapshot_ts").alias("appeared_ts")
    )


def expand_sitemaps(spark, sitemap_bodies: DataFrame, roots: list[str], max_depth: int = 10) -> DataFrame:
    """Recursive sitemap expansion (S7, sitemap_monitor.py:194-258).

    ``sitemap_bodies`` = (sitemap_url, body xml).  <sitemapindex> recursion
    is an iterative driver loop: each level is one DataFrame join+parse
    (SURVEY.md §2.1 S7); page URLs accumulate per root.
    Returns (root_sitemap, page_url) rows.
    """
    bodies = sitemap_bodies.select(F.col("sitemap_url"), F.col("body"))
    current = spark.createDataFrame([(r, r) for r in roots], "root string, sitemap_url string")
    visited = current.select("root", "sitemap_url")
    pages = None
    for _ in range(max_depth + 1):
        parsed = current.join(bodies, "sitemap_url", "inner").withColumn(
            "p", udfs.parse_sitemap(F.col("body"))
        )
        level_pages = parsed.select("root", F.explode("p.page_urls").alias("page_url"))
        pages = level_pages if pages is None else pages.unionByName(level_pages)
        children = (
            parsed.select("root", F.explode("p.child_sitemaps").alias("sitemap_url"))
            .join(visited, ["root", "sitemap_url"], "left_anti")
            .distinct()
        )
        children = children.persist()
        if children.count() == 0:
            children.unpersist()
            break
        visited = visited.unionByName(children)
        current = children
    return pages.distinct()


# --- freshness check (F14/S15; spiders/freshness_spider.py:124-174) ----------


def freshness_check(documents: DataFrame, pages: DataFrame, max_results: int | None = None) -> DataFrame:
    """HEAD-check analog: join indexed documents against the live pages table.

    Disposition routing mirrors the reference status-code rules
    (freshness_spider.py:40-43,124-174): 200 -> 'ok' (ignored);
    3xx/404 -> 'marked_for_deletion'; other -> 'not_marked'.  In the sandbox
    liveness = membership in ``pages`` (200) vs absence (404); a real
    deployment swaps the join for a mapInArrow HEAD-request client.
    """
    docs = documents.select("id", "url")
    if max_results is not None:
        docs = docs.limit(max_results)
    live = pages.select(udfs.canonicalize_url(F.col("url")).alias("url"), F.lit(True).alias("_live"))
    checked = docs.join(live, "url", "left").withColumn(
        "status_code", F.when(F.col("_live").isNotNull(), F.lit(200)).otherwise(F.lit(404))
    )
    return checked.select(
        "id",
        "url",
        "status_code",
        F.when(F.col("status_code") == 200, F.lit("ok"))
        .when((F.col("status_code") == 404) | F.col("status_code").between(300, 399), F.lit("marked_for_deletion"))
        .otherwise(F.lit("not_marked"))
        .alias("disposition"),
        (F.col("status_code") != 200).alias("marked_for_deletion"),
    )


# --- DAP pipeline (F13/X16/A1/A2/J1-J2; dap/*.py) -----------------------------


def dap_transform(raw: DataFrame) -> DataFrame:
    """Normalize + validate + group-sum DAP rows (dap/transform.py:9-71).

    Input (domain, date, visits) possibly messy; output one row per
    (domain, date) with summed visits, invalid domains dropped (F13).
    """
    norm = raw.select(
        F.regexp_replace(F.lower(F.trim(F.col("domain"))), r"^www\.", "").alias("domain"),
        F.col("date").cast("int").alias("date"),
        F.col("visits").cast("long").alias("visits"),
    )
    valid = norm.filter(
        (F.col("domain") != "")
        & (F.col("domain") != "(not set)")
        & ~F.col("domain").startswith(".")
        & F.col("domain").contains(".")
        & ~F.regexp_replace(F.col("domain"), r"\.", "").rlike("^[0-9]+$")
    )
    return valid.groupBy("domain", "date").agg(F.sum("visits").alias("visits"))


def dap_avg_daily_visits(dap: DataFrame, anchor_date: int, days_back: int = 28) -> DataFrame:
    """Average daily visits per domain over the trailing window
    (dap/datastore.py:38-77): round(sum(visits)/days_back)."""
    return (
        dap.filter(F.col("date") <= anchor_date)
        .groupBy("domain")
        .agg(F.round(F.sum("visits") / F.lit(days_back)).cast("long").alias("avg_daily_visits"))
    )


def enrich_documents_with_dap(documents: DataFrame, dap_avg: DataFrame) -> DataFrame:
    """Broadcast lookup join of per-domain average visits into documents
    (J1, indexing/helpers.py:194-215), with the reference's www-stripped
    match and subdomain suffix fallback (J2, dap/datastore.py:49-50)."""
    docs = documents.withColumn(
        "_dn", F.regexp_replace(F.col("domain_name"), r"^www\.", "")
    )
    exact = dap_avg.select(F.col("domain").alias("_dn"), F.col("avg_daily_visits"))
    out = docs.join(F.broadcast(exact), "_dn", "left")
    return out.drop("_dn").withColumnRenamed("avg_daily_visits", "dap_domain_visits_count")


# --- URL sinks (S9/S10; pipelines/pipelines.py:130-191) -----------------------


def write_urls_csv(df: DataFrame, path: str, max_records_per_file: int = 2500) -> None:
    """Rotated CSV URL sink: the reference rotates files at 100KB
    (pipelines.py:37,136-166); ~2500 40-byte URLs ≈ 100KB per file."""
    df.select("url").write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    ).csv(path)


def urls_out(documents: DataFrame) -> DataFrame:
    """The csv/endpoint item shape after column pruning (F11,
    pipelines.py:79-84): everything except the heavy extraction columns."""
    drop = [c for c in ("content", "response_bytes", "response_language", "content_type") if c in documents.columns]
    return documents.drop(*drop)


# --- content-type allowlist (F5; helpers/domain_spider.py:51-71,108-118) ------

CONTENT_TYPES_CSV_ENDPOINT = {
    "text/html", "application/pdf", "text/plain", "application/msword",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "application/vnd.ms-excel",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
}
CONTENT_TYPES_OPENSEARCH = {"text/html", "application/pdf"}


def simple_content_type(col):
    """Strip parameters/charset: 'text/html; charset=utf-8' -> 'text/html'."""
    return F.lower(F.trim(F.split(col, ";").getItem(0)))


def filter_by_content_type(df: DataFrame, output_target: str, col_name: str = "content_type") -> DataFrame:
    allow = CONTENT_TYPES_OPENSEARCH if output_target == "opensearch" else CONTENT_TYPES_CSV_ENDPOINT
    return df.withColumn("_sct", simple_content_type(F.col(col_name))).filter(
        F.col("_sct").isin(sorted(allow))
    ).drop("_sct")


# --- crawl-config validation (S2/F10; search_gov_app/crawl_config.py:44-155) --


def validate_seeds(seeds: DataFrame) -> DataFrame:
    """Config validation as DataFrame checks; returns a violations table
    (empty == valid).  Mirrors CrawlConfigs validation: unique names,
    starting_urls/allowed_domains contain '.', depth 1..250, known
    output_target (crawl_config.py:136-155; helpers/domain_spider.py:165-184)."""
    dup_names = (
        seeds.groupBy("name").count().filter(F.col("count") > 1)
        .select(F.col("name").alias("value"), F.lit("duplicate_name").alias("violation"))
    )
    bad_urls = seeds.filter(~F.col("starting_urls").contains(".") | (F.length("starting_urls") < 2)).select(
        F.col("name").alias("value"), F.lit("invalid_starting_urls").alias("violation")
    )
    bad_domains = seeds.filter(~F.col("allowed_domains").contains(".")).select(
        F.col("name").alias("value"), F.lit("invalid_allowed_domains").alias("violation")
    )
    bad_depth = seeds.filter((F.col("depth_limit") < 1) | (F.col("depth_limit") > 250)).select(
        F.col("name").alias("value"), F.lit("depth_out_of_bounds").alias("violation")
    )
    bad_target = seeds.filter(~F.col("output_target").isin("csv", "endpoint", "opensearch")).select(
        F.col("name").alias("value"), F.lit("invalid_output_target").alias("violation")
    )
    return dup_names.unionByName(bad_urls).unionByName(bad_domains).unionByName(bad_depth).unionByName(bad_target)


# --- spider id (X12; helpers/domain_spider.py:201-211) -------------------------


def spider_id(*args: str) -> str:
    """shake_256 5-byte hex digest of the concatenated job args."""
    import hashlib

    return hashlib.shake_256("".join(args).encode("utf-8")).hexdigest(5)
