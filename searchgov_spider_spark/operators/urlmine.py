"""URL template mining + crawl-trap detection over a frontier/URL corpus.

The reference's offsite/query-string middlewares
(``search_gov_spiders/middlewares.py``) filter individual URLs; at
web scale the complementary problem is *structural*: a host whose URL
space is generated (calendars, session ids, faceted search) produces
unbounded frontiers that per-URL filters never stop.  Template mining
collapses each URL to its generator pattern — digit runs become ``{n}``
— and aggregates per (host, template), so a crawler can cap or deny
templates whose instance count explodes.

Scale shape: the templating is a per-row JVM ``regexp_replace`` (one
whole-stage-codegen pass, no UDF); the rollup is ONE partial-agg'd
groupBy on (host, template) — template cardinality is tiny relative to
URL count by construction, so the shuffle carries only the combined
per-template partials.  The per-host total rides the same aggregate via
a second tiny groupBy + broadcast-size join on host.  Holds at 10^10
URLs / 10^6 hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# digit runs are the generator variables (ids, dates, pages, sessions)
TEMPLATE_PATTERN = "[0-9]+"
TEMPLATE_TOKEN = "{n}"


def url_templates(
    urls: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    trap_threshold: int = 30,
) -> DataFrame:
    """Per (host, template): instance count, share of the host's URLs,
    lexicographically-first sample URL, and a trap flag when the instance
    count reaches ``trap_threshold``."""
    templated = urls.select(
        F.col(host_col).alias("host"),
        F.regexp_replace(F.col(path_col), TEMPLATE_PATTERN, TEMPLATE_TOKEN).alias("template"),
        F.concat(F.col(host_col), F.col(path_col)).alias("_url"),
    )
    per_template = templated.groupBy("host", "template").agg(
        F.count("*").alias("n_urls"),
        F.min("_url").alias("sample_url"),
    )
    per_host = per_template.groupBy("host").agg(F.sum("n_urls").alias("_host_total"))
    return (
        per_template.join(F.broadcast(per_host), "host")
        .select(
            "host",
            "template",
            "n_urls",
            F.round(F.col("n_urls") / F.col("_host_total"), 6).alias("host_share"),
            "sample_url",
            (F.col("n_urls") >= trap_threshold).alias("trap"),
        )
    )


def allocate_budget(
    hosts: DataFrame,
    host_col: str = "host",
    score_col: str = "score",
    budget: int = 1000,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a global crawl budget
    across hosts proportional to score — the downloader-fairness planning
    step ahead of the per-host politeness caps (crawl/politeness.py
    enforces the per-host serial+delay at fetch time; this decides how many
    fetch slots each host gets per cycle).  Exact: allocations are integers
    and sum to ``budget``.

    quota = budget * score / total; every host gets floor(quota); the
    leftover slots go to the largest fractional remainders (ties broken by
    host name).  The window runs over the HOST table — bounded by host
    count, orders of magnitude smaller than the URL corpus — so the
    single-partition rank is the correct tool, not a scale concern.
    """
    from pyspark.sql import Window

    total = hosts.agg(F.sum(score_col).alias("_total"))
    quotas = hosts.join(F.broadcast(total)).select(
        F.col(host_col).alias("host"),
        F.col(score_col).alias("score"),
        (F.lit(budget) * F.col(score_col) / F.col("_total")).alias("_q"),
    )
    with_base = quotas.select(
        "host",
        "score",
        F.round("_q", 6).alias("quota"),
        F.floor("_q").alias("_base"),
        F.round(F.col("_q") - F.floor("_q"), 6).alias("_frac"),
    )
    w_rank = Window.orderBy(F.desc("_frac"), F.asc("host"))
    w_all = Window.partitionBy()
    return with_base.select(
        "host",
        "score",
        "quota",
        (
            F.col("_base")
            + F.when(
                F.row_number().over(w_rank) <= F.lit(budget) - F.sum("_base").over(w_all), 1
            ).otherwise(0)
        ).alias("alloc"),
    )


def surt_col(url_col: str):
    """SURT key (Sort-friendly URI Reordering Transform) — the canonical
    key of Common Crawl / Wayback CDX indexes: host labels lowercased and
    reversed comma-joined, then ``)`` + path, so one host's (and one
    registered domain's) URLs are CONTIGUOUS under a plain byte sort:
    ``https://news.example.com/a?b=1`` -> ``com,example,news)/a?b=1``.
    Pure codegen'd JVM string ops (split/reverse/join), no UDF."""
    host = f"lower(regexp_extract({url_col}, '^[a-z]+://([^/]+)', 1))"
    rest = f"regexp_replace({url_col}, '^[a-z]+://[^/]*', '')"
    return F.expr(
        f"concat(array_join(reverse(split({host}, '\\\\.')), ','), ')', "
        f"CASE WHEN {rest} = '' THEN '/' ELSE {rest} END)"
    )


def cdx_index(pages: DataFrame, url_col: str = "url", ts_col: str = "warc_date", extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """CDX-style capture index over a parsed page table: one row per
    capture keyed by (surt, ts) — the lookup artifact a 100-TB archive
    ships next to its WARC segments so consumers can random-access a URL
    without scanning.  Output is range-partition-sorted by the SURT key
    (`sortWithinPartitions` after a range `repartitionByRange`), the
    distributed analogue of the CDX file's global sort: k-way
    concatenation of the output files IS the sorted index.

    Scale: one range shuffle (Spark samples split points) + per-partition
    sort; no aggregation, no skew risk beyond a hot HOST, which the
    (surt, ts) composite key still spreads across captures.
    """
    out = pages.select(
        surt_col(url_col).alias("surt"),
        F.col(ts_col).alias("ts"),
        F.col(url_col).alias("url"),
        *[F.col(c) for c in extra_cols],
    )
    return out.repartitionByRange(F.col("surt"), F.col("ts")).sortWithinPartitions(
        "surt", "ts"
    )
