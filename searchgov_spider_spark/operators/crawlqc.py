"""Crawl quality-control operators: post-fetch corpus hygiene for a web-scale
crawler (soft-404 pages, mirrored hosts, crawl traps, adaptive politeness,
script profiling, composite quality ranking).

These close the loop between the fetch side (crawl/) and the curation side
(operators/curation.py): a production crawler feeds these signals back into
its frontier (drop soft-404s, collapse mirrors, demote trap hosts, retune
per-host delays).  The reference spider handles the failure modes reactively
— HTTP-status routing (searchgov-spider helpers/search_gov_spiders status
checks) and per-domain politeness caps (settings/domain_spider.py:16-18) —
here they are batch analytics over the fetched corpus, the shape a Spark
pipeline at 10^10 URLs needs.

All operators are pure DataFrame ops (JVM-side regex / hash / window
functions, zero Python UDFs) so they stay inside whole-stage codegen; each
states its shuffle count and 100-TB behavior in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Phrases that mark an HTTP-200 response whose BODY is an error page (the
# "soft 404" of Bar-Yossef et al., WWW'04 "Sic transit gloria telae").
SOFT404_PATTERN = (
    "(page not found|not found on this server|404|does not exist|"
    "no longer available|an error occurred)"
)


def soft404_flags(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 40,
    pattern: str = SOFT404_PATTERN,
) -> DataFrame:
    """Flag soft-404 documents: error-page phrasing AND a short body.

    A real crawler must catch these because the server said 200 — the
    reference's status-code routing never sees them.  Signals: count of
    error-phrase matches in the lowercased body, token count.  A page is a
    soft 404 when it matches at least one phrase and has <= ``max_tokens``
    tokens (error pages are short; long articles that merely MENTION "404"
    survive).

    Scale: one narrow map over the corpus (regexp_count + size are codegen'd
    JVM expressions) — zero shuffles; at 100 TB this is a pure scan whose
    predicate and projection push into the parquet reader.
    """
    low = F.lower(F.col(text_col))
    n_tokens = F.size(F.split(F.trim(low), r"\s+"))
    n_hits = F.regexp_count(low, F.lit(pattern))
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_hits.cast("long").alias("n_hits"),
        ((n_hits > 0) & (n_tokens <= max_tokens)).alias("is_soft404"),
    )


def mirror_host_pairs(
    docs: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "text",
    min_shared: int = 3,
    min_containment: float = 0.5,
) -> DataFrame:
    """Detect mirrored hosts: pairs of hosts serving byte-identical content.

    Shape: distinct (content-hash, host) -> self-join on the hash with
    ``host_a < host_b`` -> count shared documents per host pair -> join the
    (tiny, broadcastable) per-host totals -> containment = shared /
    min(total_a, total_b).  A pair is a mirror when it shares at least
    ``min_shared`` documents with containment >= ``min_containment``.

    Scale: the self-join key is the CONTENT hash, whose group size is the
    duplication factor of one page (small, bounded by mirror count) — never
    an all-pairs host join; the per-host totals side is |hosts| rows and
    broadcasts.  One shuffle for the distinct, one for the hash join, one
    for the pair aggregation — all on uniform keys.
    """
    hashed = (
        docs.select(
            F.md5(F.col(text_col)).alias("chash"), F.col(host_col).alias("host")
        )
        .distinct()
    )
    totals = hashed.groupBy("host").agg(F.count(F.lit(1)).alias("n_docs"))
    a = hashed.alias("a")
    b = hashed.alias("b")
    pairs = (
        a.join(b, "chash")
        .filter(F.col("a.host") < F.col("b.host"))
        .select(F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared_docs"))
    )
    ta = F.broadcast(totals.select(F.col("host").alias("host_a"), F.col("n_docs").alias("n_a")))
    tb = F.broadcast(totals.select(F.col("host").alias("host_b"), F.col("n_docs").alias("n_b")))
    return (
        pairs.join(ta, "host_a")
        .join(tb, "host_b")
        .withColumn(
            "containment",
            F.round(F.col("shared_docs") / F.least(F.col("n_a"), F.col("n_b")), 6),
        )
        .filter(
            (F.col("shared_docs") >= min_shared)
            & (F.col("containment") >= min_containment)
        )
        .select("host_a", "host_b", "shared_docs", "containment")
    )


def crawl_trap_scores(
    docs: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "text",
    min_pages: int = 20,
    threshold: float = 0.5,
) -> DataFrame:
    """Score hosts for crawl traps: URL spaces that explode while serving the
    same content (calendar pages, session-id link farms, faceted search).

    trap_score = 1 - distinct_content / pages; a host is a trap when it has
    at least ``min_pages`` pages and trap_score >= ``threshold``.  The
    frontier demotes (or caps, see q105 host_cap) flagged hosts.

    Scale: one groupBy(host) with a two-phase count-distinct on the content
    hash — partial aggregation makes the shuffle carry per-host partial
    sketches, not rows; skewed hosts are exactly the interesting ones and
    AQE splits them.
    """
    return (
        docs.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct(F.md5(F.col(text_col))).alias("n_distinct"),
        )
        .withColumn(
            "trap_score",
            F.round(F.lit(1.0) - F.col("n_distinct") / F.col("n_pages"), 6),
        )
        .withColumn(
            "is_trap",
            (F.col("n_pages") >= min_pages) & (F.col("trap_score") >= threshold),
        )
    )


def adaptive_politeness(
    fetch_log: DataFrame,
    *,
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    error_col: str = "is_error",
    base_ms: int = 1000,
    step_ms: int = 100,
    min_ms: int = 100,
    max_ms: int = 8000,
    err_window: int = 20,
    max_doublings: int = 3,
) -> DataFrame:
    """AIMD-style per-host politeness retuning from the observed fetch log.

    Multiplicative increase on errors, additive decrease on success — the
    same control law TCP congestion avoidance uses, applied to crawl delay:

        delay_i = clamp(base * 2^min(errors_in_last_W, max_doublings)
                        - step * consecutive_successes, min, max)

    (The closed form replaces the sequential fold: the doubling term reads a
    trailing error count over the last ``err_window`` fetches, the additive
    term the success run since the last error — both plain window functions,
    so the whole evolution stays declarative and shuffles ONCE on host.)

    Returns one row per host: events, errors, and the delay recommended
    after its final fetch.  Integer arithmetic throughout (shiftleft, no
    floats) so results are exactly reproducible.

    Scale: a single window partitioned by host — one shuffle; per-host state
    is O(1).  The reference hardcodes this per-domain rate
    (settings/domain_spider.py:16-18); here it adapts per host from data.
    """
    order = [F.col(c) for c in order_cols]
    w = Window.partitionBy(host_col).orderBy(*order)
    rows = F.col("_rn")
    err_rn = F.when(F.col(error_col), F.col("_rn"))
    with_state = (
        fetch_log.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_err_w",
            F.count(F.when(F.col(error_col), F.lit(1))).over(
                w.rowsBetween(-(err_window - 1), 0)
            ),
        )
        .withColumn("_last_err", F.max(err_rn).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("_succ_run", rows - F.coalesce(F.col("_last_err"), F.lit(0)))
        .withColumn(
            "_delay",
            F.greatest(
                F.lit(min_ms),
                F.least(
                    F.lit(max_ms),
                    # 2^e with e <= max_doublings is exact in double; the
                    # cast back to long keeps the arithmetic integral
                    # (shiftleft would be ideal but takes only a literal
                    # bit count)
                    (F.lit(base_ms) * F.pow(F.lit(2.0), F.least(F.col("_err_w"), F.lit(max_doublings)))).cast("long")
                    - F.lit(step_ms) * F.col("_succ_run"),
                ),
            ).cast("long"),
        )
    )
    return (
        with_state.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(error_col).cast("long")).alias("n_errors"),
            F.max_by(F.col("_delay"), F.col("_rn")).alias("recommended_delay_ms"),
        )
    )


def script_profile(
    docs: DataFrame,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language character-script profile: fractions of Latin, Cyrillic,
    and digit characters, plus how many documents are Cyrillic-dominant.

    Language-ID disagreement with the script actually used is a strong
    mislabel signal in web corpora (lang tag says "en", body is Cyrillic).
    Character-class counting via length-difference after regexp_replace —
    pure JVM regex, no tokenization, no UDF.

    Scale: narrow map + one groupBy(lang) (a handful of keys, partial-agg'd)
    — effectively a scan.
    """
    t = F.col(text_col)
    n = F.length(t).cast("double")
    latin = n - F.length(F.regexp_replace(t, "[A-Za-z]", ""))
    cyr = n - F.length(F.regexp_replace(t, "[а-яёА-ЯЁ]", ""))
    digit = n - F.length(F.regexp_replace(t, "[0-9]", ""))
    nz = F.when(n > 0, n)
    per_doc = docs.select(
        F.col(lang_col).alias("lang"),
        (latin / nz).alias("_latin"),
        (cyr / nz).alias("_cyr"),
        (digit / nz).alias("_digit"),
        (cyr > latin).cast("long").alias("_cyr_dom"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("_latin"), 6).alias("latin_frac"),
        F.round(F.avg("_cyr"), 6).alias("cyrillic_frac"),
        F.round(F.avg("_digit"), 6).alias("digit_frac"),
        F.sum("_cyr_dom").alias("cyrillic_dominant_docs"),
    )


# Stopwords for the quality ensemble — a fixed, tiny function-word list (the
# signal is the FRACTION, not the list's linguistic completeness).
ENSEMBLE_STOPWORDS = ("the", "of", "and", "to", "in", "a", "is", "that", "for", "it")


def quality_ensemble(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_pattern: str = "[a-z0-9]+",
    n_buckets: int = 10,
) -> DataFrame:
    """Composite quality rank: z-score three independent signals — log token
    count, type-token ratio, stopword fraction — average them, and bucket
    the corpus into ``n_buckets`` quality deciles.

    This is the ensembling step a curation pipeline runs AFTER the
    individual signals (q17 token stats, q42 repetition, q47 surprisal)
    exist: no single heuristic is trusted alone (C4 vs Gopher vs CCNet each
    mis-rank some pages); the z-average is the standard cheap combiner.

    Scale: per-doc signals are a narrow map (JVM regex tokenization); the
    corpus mean/std is a single tiny aggregate broadcast back (no second
    shuffle of the corpus); ntile is one global sort of (rounded composite,
    id) — the only O(n log n) step, and the one you'd replace with the q95
    HDR-sketch cutoffs at 100 TB (documented trade-off, same output shape).
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(token_pattern), 0)
    n_tok = F.size(toks).cast("double")
    n_types = F.size(F.array_distinct(toks)).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in ENSEMBLE_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("double")
    sig = docs.select(
        F.col(id_col),
        F.log(F.lit(1.0) + n_tok).alias("s_len"),
        (n_types / F.when(n_tok > 0, n_tok)).alias("s_ttr"),
        (n_stop / F.when(n_tok > 0, n_tok)).alias("s_stop"),
    )
    stats = sig.agg(
        *[F.avg(c).alias(f"mu_{c}") for c in ("s_len", "s_ttr", "s_stop")],
        *[F.stddev_samp(c).alias(f"sd_{c}") for c in ("s_len", "s_ttr", "s_stop")],
    )
    z = sig.crossJoin(F.broadcast(stats))
    zcols = [
        (F.col(c) - F.col(f"mu_{c}")) / F.when(F.col(f"sd_{c}") > 0, F.col(f"sd_{c}"))
        for c in ("s_len", "s_ttr", "s_stop")
    ]
    composite = F.round((zcols[0] + zcols[1] + zcols[2]) / F.lit(3.0), 6)
    scored = z.select(F.col(id_col), composite.alias("quality_z"))
    w = Window.orderBy(F.col("quality_z").desc(), F.col(id_col).asc())
    return scored.withColumn("decile", F.ntile(n_buckets).over(w))
