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


def write_sitemap_snapshot(snapshot: DataFrame, path: str, batch_size: int = 20) -> None:
    """Sorted sitemap-snapshot persistence (O7, sitemap_monitor.py:186-189,
    :334 — files written in sorted URL order, batches of 20 new URLs).

    ``sortWithinPartitions`` after a range repartition gives a globally
    sorted file sequence without a single-reducer global sort; small
    snapshots collapse to one sorted file via maxRecordsPerFile batching.
    """
    (
        snapshot.repartitionByRange(F.col("page_url"))
        .sortWithinPartitions("page_url")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", batch_size)
        .parquet(path)
    )


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


def discover_sitemaps(spark, bases: DataFrame, resources: DataFrame) -> DataFrame:
    """All four sitemap discovery methods (S8, sitemaps/sitemap_finder.py:
    88-230), body-driven: ``resources`` = (url, status_code, content_type,
    body) plays the HTTP layer.  Output: distinct (base_url, sitemap_url).

    Per-method semantics (single-node oracle: kernels.sitemapxml.find_sitemaps):
      1 common locations, HEAD-confirmed (status 200 + xml content type);
      2 robots.txt ``Sitemap:`` directives, absolute-only, http->https, NOT
        confirmed; 3 HTML <link rel=sitemap|alternate> + sitemap-ish .xml
        hrefs, resolved+http->https, confirmed; 4 any .xml href containing
        'sitemap', resolved, confirmed.

    Everything except the RFC-3986 href resolution (one Arrow UDF) is
    JVM-side: regexp_extract_all candidate extraction, broadcast-joined HEAD
    confirmation.  ``bases`` is a per-domain dimension, so every join here is
    broadcast-sized by construction.
    """
    from .kernels.sitemapxml import COMMON_SITEMAP_NAMES

    # normalize: trailing slash + https prefix (sitemap_finder.py:95-97)
    base = bases.select(F.col("base_url").alias("raw"))
    base = base.select(
        "raw",
        F.when(F.col("raw").endswith("/"), F.col("raw")).otherwise(F.concat("raw", F.lit("/"))).alias("_b"),
    ).select(
        F.col("raw").alias("base_url"),
        F.when(F.col("_b").rlike("^https?://"), F.col("_b")).otherwise(F.concat(F.lit("https://"), "_b")).alias("base"),
    )

    confirmed = resources.filter(
        (F.col("status_code") == 200) & F.lower(F.coalesce("content_type", F.lit(""))).contains("xml")
    ).select(F.col("url").alias("sitemap_url"), F.lit(True).alias("_ok"))
    pages_200 = resources.filter(F.col("status_code") == 200).select("url", "body")

    def fix_http(c):  # sitemap_finder.py:82-86: strip + REPLACE-ALL of http://
        # The reference uses str.replace, which rewrites every occurrence
        # (even an embedded http:// in a query param) when the URL starts
        # with http:// — mirror that exactly so the kernel (fix_http in
        # kernels/sitemapxml.py) and this distributed path agree on all inputs.
        t = F.trim(c)
        return F.when(
            t.startswith("http://"), F.replace(t, F.lit("http://"), F.lit("https://"))
        ).otherwise(t)

    # method 1: common locations (base ends with '/', so urljoin == concat)
    m1 = base.select(
        "base_url",
        F.explode(F.array(*[F.lit(n) for n in COMMON_SITEMAP_NAMES])).alias("name"),
        "base",
    ).select("base_url", F.concat("base", "name").alias("sitemap_url"))
    m1 = m1.join(F.broadcast(confirmed), "sitemap_url", "left_semi")

    # method 2: robots.txt Sitemap: directives (no confirmation).  resources
    # is the big side — broadcast the per-domain base dimension into it.
    robots = pages_200.join(
        F.broadcast(base.withColumn("url", F.concat("base", F.lit("robots.txt")))), "url"
    )
    m2 = robots.select(
        "base_url",
        F.explode(F.regexp_extract_all("body", F.lit(r"(?i)Sitemap:\s*(https?://\S+)"), F.lit(1))).alias("sm"),
    ).select("base_url", fix_http(F.col("sm")).alias("sitemap_url"))

    # methods 3+4 read the base page html
    page = pages_200.join(F.broadcast(base.withColumn("url", F.col("base"))), "url")
    link_pat = r"""<link[^>]*rel=["'](?:sitemap|alternate)["'][^>]*href=["']([^"']+)["']"""
    smxml_pat = r"""href=["']([^"']*sitemap[^"']*\.xml)["']"""
    anyxml_pat = r"""href=["']([^"']+\.xml)["']"""
    m3_rel = page.select(
        "base_url", "base",
        F.explode(
            F.concat(
                F.regexp_extract_all("body", F.lit("(?i)" + link_pat), F.lit(1)),
                F.regexp_extract_all("body", F.lit("(?i)" + smxml_pat), F.lit(1)),
            )
        ).alias("rel"),
    )
    m3 = m3_rel.select(
        "base_url", fix_http(udfs.url_join(F.col("base"), F.col("rel"))).alias("sitemap_url")
    ).join(F.broadcast(confirmed), "sitemap_url", "left_semi")
    m4_rel = page.select(
        "base_url", "base",
        F.explode(F.regexp_extract_all("body", F.lit("(?i)" + anyxml_pat), F.lit(1))).alias("rel"),
    ).filter(F.lower("rel").contains("sitemap"))
    m4 = m4_rel.select(
        "base_url", udfs.url_join(F.col("base"), F.col("rel")).alias("sitemap_url")
    ).join(F.broadcast(confirmed), "sitemap_url", "left_semi")

    return (
        m1.select("base_url", "sitemap_url")
        .unionByName(m2.select("base_url", "sitemap_url"))
        .unionByName(m3.select("base_url", "sitemap_url"))
        .unionByName(m4.select("base_url", "sitemap_url"))
        .distinct()
    )


# --- freshness check (F14/S15; spiders/freshness_spider.py:124-174) ----------


def freshness_check(
    documents: DataFrame,
    pages: DataFrame,
    max_results: int | None = None,
    exceptions: DataFrame | None = None,
) -> DataFrame:
    """HEAD-check analog: join indexed documents against the live pages table.

    Disposition routing mirrors the reference status-code rules
    (freshness_spider.py:40-43,124-174): 200 -> 'ok' (ignored);
    3xx/404 -> 'marked_for_deletion'; other -> 'not_marked'.  In the sandbox
    liveness = membership in ``pages`` (200) vs absence (404); a real
    deployment swaps the join for a mapInArrow HEAD-request client.

    ``exceptions`` (id, exception_type, exception_message) marks fetches that
    raised: those rows get a null status_code, result = exception type, a
    populated ``exception`` struct, and marked_for_deletion = False — the
    reference's FreshnessSpiderExceptionItem (items.py:40-47,112-119,
    freshness_spider.py:130-143).
    """
    docs = documents.select("id", "url")
    if max_results is not None:
        docs = docs.limit(max_results)
    live = pages.select(udfs.canonicalize_url(F.col("url")).alias("url"), F.lit(True).alias("_live"))
    checked = docs.join(live, "url", "left").withColumn(
        "status_code", F.when(F.col("_live").isNotNull(), F.lit(200)).otherwise(F.lit(404))
    )
    if exceptions is not None:
        exc = exceptions.select("id", "exception_type", "exception_message")
        checked = checked.join(F.broadcast(exc), "id", "left")
    else:
        checked = checked.withColumn("exception_type", F.lit(None).cast("string")).withColumn(
            "exception_message", F.lit(None).cast("string")
        )
    is_exc = F.col("exception_type").isNotNull()
    return checked.select(
        "id",
        "url",
        F.when(is_exc, F.lit(None).cast("int")).otherwise(F.col("status_code")).alias("status_code"),
        F.when(is_exc, F.lit("exception"))
        .when(F.col("status_code") == 200, F.lit("ok"))
        .when((F.col("status_code") == 404) | F.col("status_code").between(300, 399), F.lit("marked_for_deletion"))
        .otherwise(F.lit("not_marked"))
        .alias("disposition"),
        F.when(is_exc, F.lit(False)).otherwise(F.col("status_code") != 200).alias("marked_for_deletion"),
        F.when(is_exc, F.col("exception_type")).otherwise(F.col("status_code").cast("string")).alias("result"),
        F.when(
            is_exc,
            F.struct(
                F.col("exception_type").alias("exception_type"),
                F.col("exception_message").alias("exception_message"),
            ),
        ).alias("exception"),
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


def dap_paged_fetch(fetch_page, limit: int = 1000) -> list[dict]:
    """Driver-side DAP API paging loop (S14, reference dap/connect.py:27-68):
    1-based pages of ``limit`` rows; stops at the first EMPTY page (the
    reference keeps paging even on a short page — mirrored here).  The feed
    is a per-domain dimension (bounded), so accumulating it on the driver is
    the reference's own shape; the heavy work happens after createDataFrame.

    ``fetch_page(page, limit) -> list[dict]`` is the injectable HTTP call.
    """
    out: list[dict] = []
    page = 0
    while True:
        page += 1
        rows = fetch_page(page, limit)
        if not rows:
            break
        out.extend(rows)
    return out


def dap_ingest(spark, fetch_page, limit: int = 1000) -> DataFrame:
    """Paged fetch -> DataFrame -> normalize/validate/group (the full S14 +
    F13/X16/A1 ingest path)."""
    rows = dap_paged_fetch(fetch_page, limit)
    raw = spark.createDataFrame(rows, "domain string, date string, visits string")
    return dap_transform(raw)


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


def _default_post_transport_factory():
    """stdlib urllib POST transport (no extra deps); injectable so tests and
    replays supply fakes, exactly like crawl.fetch.HttpFetcher."""

    def factory():  # pragma: no cover - requires network
        import json
        import urllib.request

        def transport(api_url: str, urls: list[str], timeout_s: float) -> int:
            req = urllib.request.Request(
                api_url,
                data=json.dumps({"urls": urls}).encode("utf-8"),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return resp.status

        return transport

    return factory


class HttpEndpointSink:
    """S10: the 100 KB-batched URL POST sink (pipelines.py:130-191
    ``_process_api_item`` / ``_send_post_request`` / ``close_spider``),
    re-expressed as a partition-local batcher with an injectable transport:

      * URLs buffer per partition; when the buffered utf-8 byte total
        reaches ``max_batch_bytes`` (reference: MAX_URL_BATCH_SIZE_BYTES,
        checked AFTER each append), the batch POSTs as ``{"urls": [...]}``
        with ``timeout_s`` (reference: 60 s) and the buffer clears.
      * At partition end the remainder flushes (``close_spider``).
      * A failed POST drops THAT batch and continues — the buffer is
        cleared in ``finally`` exactly like the reference's DropItem path;
        there is NO retry.

    ``post_urls`` returns a small RECEIPTS DataFrame (one row per POST
    attempt: partition, batch seq, url count, byte size, status, ok) so the
    flush behavior is observable, testable, and auditable — the Spark
    analog of the reference's per-batch log lines.  The transport is a
    callable ``(api_url, urls, timeout_s) -> status_code``; the factory
    must be picklable (it ships to executors)."""

    RECEIPT_SCHEMA = (
        "partition_id int, batch_seq int, n_urls long, n_bytes long, status int, ok boolean"
    )

    def __init__(
        self,
        api_url: str,
        transport_factory=None,
        max_batch_bytes: int = 100 * 1024,
        timeout_s: float = 60.0,
    ):
        self.api_url = api_url
        self.transport_factory = transport_factory or _default_post_transport_factory()
        self.max_batch_bytes = max_batch_bytes
        self.timeout_s = timeout_s

    def post_urls(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        api_url, factory = self.api_url, self.transport_factory
        maxb, timeout_s = self.max_batch_bytes, self.timeout_s

        def run(batches):
            import pandas as pd
            from pyspark import TaskContext

            transport = factory()
            ctx = TaskContext.get()
            part = ctx.partitionId() if ctx is not None else -1
            buf: list[str] = []
            nbytes = 0
            seq = 0
            receipts: list[tuple] = []

            def flush():
                nonlocal buf, nbytes, seq
                if not buf:
                    return
                status, ok = None, False
                try:
                    status = int(transport(api_url, list(buf), timeout_s))
                    ok = 200 <= status < 300
                except Exception:
                    pass  # batch dropped, no retry (DropItem analog)
                finally:
                    receipts.append((part, seq, len(buf), nbytes, status, ok))
                    seq += 1
                    buf, nbytes = [], 0

            for pdf in batches:
                for u in pdf[url_col]:
                    if u is None:
                        continue
                    u = str(u)
                    buf.append(u)
                    nbytes += len(u.encode("utf-8"))
                    if nbytes >= maxb:
                        flush()
            flush()  # close_spider: send the remainder
            yield pd.DataFrame(
                receipts,
                columns=["partition_id", "batch_seq", "n_urls", "n_bytes", "status", "ok"],
            )

        return df.select(url_col).mapInPandas(run, schema=self.RECEIPT_SCHEMA)


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
