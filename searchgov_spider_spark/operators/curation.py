"""Corpus-curation operators: benchmark decontamination, PII redaction,
cross-corpus line dedup, and deterministic stratified sampling
(training-data pipeline ops beyond the reference's own surface, per the
build brief's LLM-pipeline mandate).

Scale notes (the 100-TB design point):
- ``decontaminate`` joins the 100-TB training side against the *eval* n-gram
  set, which is small by construction (benchmarks are 10^3-10^5 documents ->
  ~10^6-10^7 distinct n-grams, a few hundred MB of strings).  The eval side
  is therefore ``broadcast()`` — the scan side streams map-side with no
  shuffle of the big table; the only shuffle is the per-doc hit aggregation,
  keyed by doc id (uniform, unskewed).
- ``stratified_sample`` is a pure map-side filter: md5 of the document id is
  compared against a per-stratum hex cutoff joined in via a broadcast rates
  dimension.  Zero shuffles, fully whole-stage-codegen, and the sample is
  DETERMINISTIC — re-running at any cluster size or partitioning yields the
  identical row set (unlike ``df.sample``, which is partition-layout
  dependent), which is what reproducible training-data builds require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag training documents sharing any token ``n``-gram with an
    eval/benchmark set — the n-gram-overlap decontamination rule used by
    GPT-3/PaLM-style data pipelines (13-gram in the GPT-3 appendix; ``n`` is
    a parameter here and the test/oracle default is 8 to suit short
    synthetic docs).

    Returns one row per training doc: (id, n_hit_ngrams, contaminated),
    where ``n_hit_ngrams`` counts DISTINCT n-grams of the doc that appear
    anywhere in the eval set.  Documents shorter than ``n`` tokens
    contribute their whole-document gram (same convention as the dedup
    shingler, so a verbatim short eval doc still hits).
    """
    grams = shingles_col(text_col, n)
    eval_grams = eval_docs.select(F.explode(grams).alias("gram")).distinct()
    # per-doc distinct INSIDE the row (array_distinct) instead of a
    # corpus-wide .distinct(): identical hit counts — distinct-on-(id, gram)
    # equals distinct-within-each-doc's-array — but the training side now
    # reaches the broadcast probe with ZERO exchanges (r06; the .distinct()
    # shuffled the whole exploded gram table before the join)
    doc_grams = docs.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hit_ngrams", F.lit(0)).alias("n_hit_ngrams"),
            (F.coalesce("n_hit_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# PII patterns restricted to constructs Java regex and DuckDB's RE2 parse
# identically (no lookarounds, no backrefs).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
}


def pii_redact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Training-data PII scrubbing: count and mask emails, US SSNs and
    phone numbers with typed placeholders (``<EMAIL>``/``<SSN>``/``<PHONE>``).

    Pure JVM ``regexp_extract_all``/``regexp_replace`` — whole-stage codegen,
    zero shuffles, linear scan of the corpus.  SSN before phone: the longer
    dash pattern must not be half-eaten by the shorter one.
    """
    redacted = F.col(text_col)
    counts = []
    for name in ("email", "ssn", "phone"):
        pat = PII_PATTERNS[name]
        # Spark SQL string literals process backslash escapes -> double them
        pat_sql = pat.replace("\\", "\\\\")
        counts.append(
            F.expr(f"size(regexp_extract_all({text_col}, '{pat_sql}', 0))").alias(f"n_{name}s")
        )
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return docs.select(F.col(id_col), *counts, redacted.alias("redacted_text"))


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
) -> DataFrame:
    """CCNet-style cross-corpus line deduplication: a line occurring in more
    than one place survives only at its first occurrence (min ``(id, pos)``
    over the whole corpus); every other occurrence is dropped.

    Input: one row per doc with an ARRAY of lines (split upstream, so the
    line convention is the caller's).  Output per doc: the surviving lines
    re-joined in original order, plus kept/removed counts.  Docs whose lines
    are all removed still emit a row (empty text) — the caller decides the
    min-length gate afterwards, as CCNet does.

    Scale shape: explode -> one groupBy on the line string (partial-agg'd
    map-side; the heavy key space is the corpus's distinct lines, uniformly
    hash-partitioned) -> join back on line -> one groupBy on doc id to
    reassemble.  Line strings can be md5'd first at petabyte scale; kept
    verbatim here so the oracle is plain SQL.

    Skew: boilerplate lines (cookie banners, nav text) are the crawl-native
    hot keys of the join-back — a line occurring in 10^8 docs puts 10^8
    probe rows on one key.  The build side carries exactly one row per line
    (first_at, n_occ), so AQE skew-join (on in build_session) splits the hot
    partition and replicates the 1-row build side; the groupBys are immune
    (map-side partial agg absorbs hot keys before the shuffle).
    """
    pos_lines = docs.select(
        F.col(id_col), F.posexplode(lines_col).alias("pos", "line")
    )
    first = pos_lines.groupBy("line").agg(
        F.min(F.struct(id_col, "pos")).alias("first_at"),
        F.count("*").alias("n_occ"),
    )
    kept = (
        pos_lines.join(first, "line")
        .withColumn(
            "_keep",
            (F.col("n_occ") == 1)
            | ((F.col(f"first_at.{id_col}") == F.col(id_col)) & (F.col("first_at.pos") == F.col("pos"))),
        )
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(F.col("_keep"), F.struct("pos", "line")))
                    ),
                    lambda x: x["line"],
                ),
                " ",
            ).alias("clean_text"),
            F.sum(F.col("_keep").cast("int")).alias("n_kept"),
            F.sum((~F.col("_keep")).cast("int")).alias("n_removed"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    cutoffs: dict[str, str],
    default_cutoff: str = "0000",
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """Deterministic hash-based stratified sampling: keep a document when
    the first 4 hex chars of ``md5(cast(id as string))`` sort strictly below
    the stratum's cutoff.  ``cutoffs`` maps stratum value -> 4-hex-char
    cutoff ("8000" keeps ~50%, "4000" ~25%, "ffff"+1 is unreachable so
    "ffff" keeps ~99.998%); strata absent from the map use
    ``default_cutoff`` ("0000" = drop).

    The rates table is a broadcast dimension (tiny by construction), the
    predicate is codegen string comparison — no shuffle, no RNG, identical
    output at any partitioning.
    """
    spark = docs.sparkSession
    rates = spark.createDataFrame(
        [(k, v) for k, v in sorted(cutoffs.items())],
        f"{strata_col} string, cutoff string",
    )
    bucket = F.expr(f"substring(md5(cast({id_col} as string)), 1, 4)")
    return (
        docs.join(F.broadcast(rates), strata_col, "left")
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.coalesce("cutoff", F.lit(default_cutoff)))
        .drop("cutoff")
    )


def hashed_classifier_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    threshold: float = 0.5,
) -> DataFrame:
    """Model-based quality filtering with the hashing trick — the Spark
    plumbing of a fastText/logistic quality classifier (the GPT-3/LLaMA
    "looks-like-Wikipedia" curation stage), with a DETERMINISTIC weight
    table so the oracle can re-derive every score without a model file:

    - feature: each token hashes into one of ``n_buckets`` buckets via the
      first 6 hex chars of md5(token) mod n_buckets (md5 exists identically
      in Spark and the SQL oracle; a production swap-in would use the
      trained model's own murmur bucketing here);
    - weight(bucket) = (bucket * 2654435761 mod 2^16) / 2^16 - 0.5, a
      Knuth-multiplicative pseudo-weight in [-0.5, 0.5) standing in for
      trained coefficients;
    - score = sig(8 * mean token weight) with the ALGEBRAIC sigmoid
      sig(x) = 0.5 * (1 + x / (1 + |x|)) — same S-shape/range as the
      logistic, but built only from IEEE-754 correctly-rounded ops
      (+, *, /, abs), so Spark (JVM) and any SQL oracle (C libm) produce
      bit-identical doubles; exp() differs by 1 ulp across libms and
      flips round(., 6) boundaries.  ``keep`` = score >= threshold.

    Scale shape: this is the important part — scoring is a PURE MAP: the
    weight "table" is an arithmetic expression, so the 100-TB corpus is
    scored inside whole-stage codegen with ZERO shuffles, zero joins, and
    no Python.  A real trained model changes the constants (broadcast a
    weight array and ``element_at`` it), never the shape.  Aggregate-free
    per-doc mean via aggregate() over the token array — no explode, so no
    row blow-up either.
    """
    toks = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    # casts matter: a bare `65536.0` / `0.5` literal is DECIMAL in both Spark
    # and DuckDB, and bigint/decimal division rounds in decimal digits — the
    # weights stop being exact dyadic rationals and the two engines drift
    w = (
        f"transform({toks}, t -> "
        f"((cast(conv(substring(md5(t), 1, 6), 16, 10) as bigint) % {n_buckets})"
        f" * 2654435761 % 65536) / cast(65536 as double) - cast(0.5 as double))"
    )
    mean_w = f"aggregate({w}, cast(0.0 as double), (a, x) -> a + x) / greatest(size({toks}), 1)"
    score = f"0.5 * (1.0 + (8.0 * ({mean_w})) / (1.0 + abs(8.0 * ({mean_w}))))"
    return docs.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.round(F.expr(score), 6).alias("quality_score"),
        (F.expr(score) >= F.lit(threshold)).alias("keep"),
    )


def c4_line_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line and document filters (Raffel et al. 2020, §2.2 — the
    cleaning recipe behind the C4 corpus), deterministic subset:

    - a LINE survives iff (rtrimmed) it ends in terminal punctuation
      (``.``, ``!``, ``?``, ``"``), has >= ``min_words_per_line``
      whitespace-delimited words, and does not mention ``javascript``
      (case-insensitive);
    - a DOCUMENT survives iff its lowercased text contains neither
      ``lorem ipsum`` nor ``{`` (the code/boilerplate tell) and at least
      ``min_kept_lines`` lines survive (surrogate for C4's >= 5 sentences).

    Returns (id, n_lines, n_kept_lines, doc_keep, kept_text) where
    ``kept_text`` is the surviving lines re-joined with ``\\n`` in original
    order — the cleaned document a downstream stage trains on.

    Scale shape: a PURE MAP — the line split, per-line predicate, and
    re-join all run on the array inside whole-stage codegen; zero shuffles,
    zero joins, no Python.  (C4's fourth rule, three-sentence-span dedup,
    is the cross-corpus shuffle op — that lives in :func:`line_dedup`.)
    """
    lines = f"split({text_col}, '\\n')"
    keep = (
        f"filter({lines}, l -> rtrim(l) rlike '[.!?\"]$' "
        f"AND size(regexp_extract_all(l, '\\\\S+', 0)) >= {min_words_per_line} "
        f"AND NOT contains(lower(l), 'javascript'))"
    )
    return docs.select(
        F.col(id_col),
        F.expr(f"size({lines})").alias("n_lines"),
        F.expr(f"size({keep})").alias("n_kept_lines"),
        (
            ~F.lower(F.col(text_col)).contains("lorem ipsum")
            & ~F.col(text_col).contains("{")
            & (F.expr(f"size({keep})") >= F.lit(min_kept_lines))
        ).alias("doc_keep"),
        F.expr(f"array_join({keep}, '\\n')").alias("kept_text"),
    )


def dsir_log_weights(
    docs: DataFrame,
    target_pred: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed-unigram features are under the TARGET
    distribution (rows matching ``target_pred``, e.g. the high-quality
    slice) than under the RAW corpus distribution.

    weight(d) = mean over tokens t of
        log2( p_target(bucket(t)) / p_raw(bucket(t)) )
    with bucket(t) = first 6 md5 hex chars of t mod ``n_buckets`` (the same
    engine-portable hashing trick as ``hashed_classifier_score``) and
    add-one smoothing: p(b) = (count(b) + 1) / (total + n_buckets), so
    unseen buckets are defined on both sides.  DSIR proper resamples with
    probability ∝ exp(weight); emitting the log-weight keeps the operator
    deterministic and lets the caller pair it with ``stratified_sample``'s
    md5-cutoff machinery for the actual draw.

    Scale shape — the reason this beats the naive join plan: the two
    bucket LMs are ``n_buckets`` rows by construction, so they are built
    with one partial-agg groupBy each and collected (bounded driver state,
    like the IVF quantizer's ~4096-row sample), then burned into the
    scoring expression as a literal lookup array.  Scoring the 100-TB
    corpus is therefore a PURE MAP — zero shuffles, zero joins, no
    Python — inside whole-stage codegen; ``aggregate()`` folds the token
    array without an explode, so no row blow-up either.  Docs with zero
    tokens get weight NULL (they carry no evidence).
    """
    import math

    toks = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    bucket = f"cast(conv(substring(md5(t), 1, 6), 16, 10) as bigint) % {n_buckets}"
    bucketed = docs.select(
        F.expr(f"boolean({target_pred})").alias("_is_target"),
        F.explode(F.expr(f"transform({toks}, t -> {bucket})")).alias("b"),
    )
    counts = (
        bucketed.groupBy("b")
        .agg(
            F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("ct"),
            F.count("*").alias("cr"),
        )
        .collect()
    )  # bounded: <= n_buckets rows at ANY corpus size
    ct = {r["b"]: r["ct"] for r in counts}
    cr = {r["b"]: r["cr"] for r in counts}
    t_total = sum(ct.values()) + n_buckets
    r_total = sum(cr.values()) + n_buckets
    # per-bucket log ratio as exact double literals; both numerator and
    # denominator products stay < 2^53 so the ratio is correctly rounded
    ratios = [
        math.log2(
            ((ct.get(b, 0) + 1) * r_total) / ((cr.get(b, 0) + 1) * t_total)
        )
        for b in range(n_buckets)
    ]
    lut = "array(" + ", ".join(f"cast({w!r} as double)" for w in ratios) + ")"
    w_sum = (
        f"aggregate(transform({toks}, t -> element_at({lut}, cast({bucket} as int) + 1)), "
        f"cast(0.0 as double), (a, x) -> a + x)"
    )
    return docs.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.round(
            F.when(F.expr(f"size({toks})") > 0, F.expr(w_sum) / F.expr(f"size({toks})")),
            6,
        ).alias("dsir_log_weight"),
    )


def source_reputation(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    short_tokens: int = 50,
    min_docs: int = 3,
    keep_threshold: float = 0.5,
) -> DataFrame:
    """Source-level (per-domain) curation rollup — the RefinedWeb/Dolma
    pattern of filtering whole sources rather than documents: a domain
    whose pages are mostly duplicated or mostly near-empty is dropped
    wholesale (public precedent: Penedo et al. 2023 §3.1 URL/domain
    filtering; Dolma's per-domain quality gates).  Reference tie-in: the
    reference curates at the domain list level too — its seeds file admits
    or rejects whole domains (``utility_files/crawl-sites-sample.json``),
    and DAP-driven analytics rank domains by visits; this is the corpus-
    side generalization with measured signals.

    Per-source signals (all pure-JVM, codegen'd):
      - ``n_docs``, ``avg_tokens`` (regexp token count per doc),
      - ``dup_rate``  = 1 − distinct(md5(text)) / n_docs   (exact-dup mass),
      - ``short_rate`` = share of docs under ``short_tokens`` tokens,
      - ``score`` = (1 − dup_rate) × (1 − short_rate), rounded to 6 dp,
      - ``keep``  = score ≥ keep_threshold AND n_docs ≥ min_docs.

    Scale shape: ONE groupBy on the source key with fully partial-aggable
    terms (count, sum, approx-free distinct via count_distinct on the
    128-bit digest — still a partial-agg'd HashAggregate pair); output is
    source-cardinality-sized (millions of domains, not billions of docs).
    A pathological mega-domain is one hot key: AQE skew handling applies,
    and every term here tolerates two-level aggregation.  The keep column
    joins back to the corpus as a broadcast (domains ≪ docs).
    """
    from .dedup import TOKEN_PATTERN

    toks = f"size(regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0))"
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("_h"),
        F.expr(toks).alias("_nt"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("_nt"), 6).alias("avg_tokens"),
        F.round(
            F.lit(1.0) - F.countDistinct("_h") / F.count("*"), 6
        ).alias("dup_rate"),
        F.round(
            F.avg(F.when(F.col("_nt") < short_tokens, 1.0).otherwise(0.0)), 6
        ).alias("short_rate"),
    )
    score = F.round(
        (F.lit(1.0) - F.col("dup_rate")) * (F.lit(1.0) - F.col("short_rate")), 6
    )
    return agg.withColumn("score", score).withColumn(
        "keep",
        (F.col("score") >= keep_threshold) & (F.col("n_docs") >= min_docs),
    )


def host_boilerplate(
    docs: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    lines_col: str = "lines",
    min_docs: int = 10,
    min_share: float = 0.3,
) -> DataFrame:
    """Host-level boilerplate line detection (the RefinedWeb / CCNet
    line-wise filter's discovery pass): a line is boilerplate for a host
    when it occurs in >= ``min_share`` of the host's documents and the host
    has >= ``min_docs`` documents — nav bars, cookie banners, footers.

    Scale shape: explode -> per-(host, line, doc) distinct -> ONE
    partial-agg'd groupBy on (host, line); host doc totals are a tiny
    per-host aggregate broadcast back.  Output is bounded to lines seen in
    more than one document, so the result is the host's repeated-line
    vocabulary, not the corpus.
    """
    per_doc_lines = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("_doc"),
        F.explode(F.array_distinct(F.col(lines_col))).alias("line"),
    ).distinct()
    line_counts = per_doc_lines.groupBy("host", "line").agg(
        F.count("*").alias("n_docs_with_line")
    )
    host_totals = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(F.col(id_col)).alias("host_docs")
    )
    return (
        line_counts.filter(F.col("n_docs_with_line") >= 2)
        .join(F.broadcast(host_totals), "host")
        .select(
            "host",
            "line",
            "n_docs_with_line",
            "host_docs",
            F.round(F.col("n_docs_with_line") / F.col("host_docs"), 6).alias("share"),
            (
                (F.col("n_docs_with_line") >= F.col("host_docs") * min_share)
                & (F.col("host_docs") >= min_docs)
            ).alias("boilerplate"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row gets key = ln(u) / w with u a
    hash-uniform in (0,1); the k largest keys are an exact weighted sample
    — the standard way a corpus build draws a quality-weighted subset
    (w = quality score, length, dedup multiplicity ...) reproducibly.

    u comes from the first 8 hex chars of md5(id || '#salt') as
    (v + 0.5) / 2^32 — dyadic, never 0 or 1, no RNG, identical in any
    engine.  The key is computed map-side (codegen ln + divide), rounded to
    6dp BEFORE ranking with an id tie-break so the selection order is total
    and engine-portable; the global top-k compiles to TakeOrderedAndProject
    (k rows per partition cross the wire, never the corpus).

    Output: id, weight, sample_key (round 6), rank 1..k.
    """
    from pyspark.sql import Window

    v = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{salt}"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (v + F.lit(0.5)) / F.lit(float(1 << 32))
    key = F.round(F.log(u) / F.col(weight_col), 6)
    top = (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(weight_col).alias("weight"),
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.asc("id"))
        .limit(k)
    )
    # rank window runs over the k-row result only, never the corpus
    w = Window.orderBy(F.desc("sample_key"), F.asc("id"))
    return top.withColumn("rank", F.row_number().over(w))


def stratified_weighted_sample(
    df: DataFrame,
    alloc: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    salt: str = "sws",
) -> DataFrame:
    """Per-stratum A-ES weighted sampling without replacement: draw exactly
    ``alloc`` rows from each stratum (the consumption side of
    temperature_allocation / allocate_budget — those decide HOW MANY per
    stratum, this decides WHICH, with the same no-RNG hash-key contract as
    weighted_sample: key = round(ln(u)/w, 6), id tie-break).

    ``alloc``: a tiny (strata_col, alloc) quota table — broadcast.

    Scale: a naive per-stratum rank window sorts each stratum in ONE task,
    which dies when a stratum holds 10^9 rows.  Instead the classic
    two-phase top-k: phase 1 ranks within (stratum, input partition) and
    keeps the per-partition top-max(alloc) — any global top-quota row is
    necessarily in its partition's top-quota, so the survivor set is a
    superset of every final sample regardless of partitioning; phase 2
    ranks the survivors (<= max_alloc * n_partitions rows per stratum, tiny)
    and applies the per-stratum quota.  Output is partition-invariant and
    the corpus-sized side never sorts globally.

    Output: strata_col, id_col, weight, sample_key, sample_rank (1..alloc).
    """
    from pyspark.sql import Window

    quotas = alloc.select(strata_col, "alloc").collect()  # bounded: strata count
    max_alloc = max((int(r["alloc"]) for r in quotas), default=0)
    v = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{salt}"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (v + F.lit(0.5)) / F.lit(float(1 << 32))
    keyed = df.select(
        strata_col,
        id_col,
        F.col(weight_col).alias("weight"),
        F.round(F.log(u) / F.col(weight_col), 6).alias("sample_key"),
    )
    w_local = Window.partitionBy(strata_col, F.spark_partition_id()).orderBy(
        F.desc("sample_key"), F.asc(id_col)
    )
    survivors = keyed.withColumn("_lr", F.row_number().over(w_local)).filter(
        F.col("_lr") <= max_alloc
    )
    w_global = Window.partitionBy(strata_col).orderBy(F.desc("sample_key"), F.asc(id_col))
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w_global))
        .join(F.broadcast(alloc.select(strata_col, "alloc")), strata_col)
        .filter(F.col("sample_rank") <= F.col("alloc"))
        .select(strata_col, id_col, "weight", "sample_key", "sample_rank")
    )


def group_split(
    df: DataFrame,
    group_col: str,
    splits: list[tuple[str, float]] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe deterministic train/val/test assignment: the split is a
    pure function of the GROUP key (host/domain/source), so every document
    from one site lands in the same split — near-duplicate pages and
    boilerplate from a single host can never straddle the train/eval
    boundary (the standard group-aware split a training-data build uses
    instead of row-level random splitting).

    u = (first 8 md5 hex digits of group||'#salt' + 0.5) / 2^32 — the same
    no-RNG dyadic uniform as the stratified sampler; cumulative fraction
    cutoffs assign the split name.  Adding a new split or re-running at any
    scale never reassigns an existing group (hash stability).

    Scale: a pure map — one md5 + comparisons per row, zero shuffle, zero
    joins; the group key is hashed in place, no group table is ever built.

    Output: df's columns + ``split``.
    """
    splits = splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    v = F.conv(
        F.substring(F.md5(F.concat(F.col(group_col).cast("string"), F.lit(f"#{salt}"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (v + F.lit(0.5)) / F.lit(float(1 << 32))
    expr = F.lit(splits[-1][0])
    cum = 0.0
    branches = []
    for name, frac in splits[:-1]:
        # round the cumulative cutoff so 0.6+0.2 is the literal double 0.8,
        # bit-identical to the SQL oracle's constant
        cum = round(cum + frac, 12)
        branches.append((name, cum))
    for name, cutoff in reversed(branches):
        expr = F.when(u < F.lit(cutoff), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def weighted_sample_u_sql(id_expr: str, salt: str = "ws") -> str:
    """DuckDB expression for the same hash-uniform u (no conv in DuckDB:
    8 hex digits decoded positionally with strpos)."""
    h = f"md5(CAST({id_expr} AS VARCHAR) || '#{salt}')"
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}.0"
        for i in range(8)
    )
    return f"(({digits}) + 0.5) / {float(1 << 32)!r}"


def temperature_allocation(
    strata: DataFrame,
    budget: int,
    alpha: float = 0.3,
    strata_col: str = "lang",
    count_col: str = "n_docs",
) -> DataFrame:
    """Temperature-resampled mixture allocation (the multilingual-LM
    sampling rule of Lample & Conneau 2019 / XLM-R): stratum probability
    proportional to (share)^alpha, flattened toward uniform as alpha -> 0,
    then an EXACT integer split of ``budget`` via the same largest-remainder
    apportionment the crawl budget uses (urlmine.allocate_budget).

    The only cross-engine float risk is pow(); the weight is immediately
    quantized to integer parts-per-million (a 1-ulp pow difference cannot
    move the rounded ppm off a boundary in practice), so the Hamilton stage
    runs on exact BIGINTs.  The strata table is tiny by construction — the
    corpus itself is never touched here.

    Output: stratum, n_docs, share (round 6), temp_weight_ppm, quota
    (round 6), alloc; sum(alloc) == budget.
    """
    from . import urlmine

    total = strata.agg(F.sum(count_col).alias("_total"))
    weighted = strata.join(F.broadcast(total)).select(
        F.col(strata_col).alias("stratum"),
        F.col(count_col).alias("n_docs"),
        F.round(F.col(count_col) / F.col("_total"), 6).alias("share"),
        F.round(F.pow(F.col(count_col) / F.col("_total"), F.lit(alpha)) * 1_000_000)
        .cast("bigint")
        .alias("temp_weight_ppm"),
    )
    alloc = urlmine.allocate_budget(
        weighted.select(F.col("stratum").alias("host"), F.col("temp_weight_ppm").alias("score")),
        budget=budget,
    ).select(
        F.col("host").alias("stratum"),
        F.col("quota"),
        F.col("alloc"),
    )
    return weighted.join(F.broadcast(alloc), "stratum").select(
        "stratum", "n_docs", "share", "temp_weight_ppm", "quota", "alloc"
    )


def host_cap(
    docs: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    safety: float = 2.0,
) -> DataFrame:
    """Hot-host downsampling: keep at most ``cap`` documents per host,
    chosen deterministically by md5 order (web corpora are Zipf-skewed —
    a handful of hosts contribute most rows, and uncapped they dominate
    the training mixture; reference analog: the per-domain URL caps the
    search.gov crawl enforces via its seed scoping,
    search_gov_crawler/search_gov_spiders/helpers/domain_spider.py:1-40).

    Exact semantics: rank rows within each host by
    ``(md5(cast(id as string)), id)`` ascending and keep rank <= cap —
    a deterministic uniform sample, stable under any partitioning.

    Scale shape: the naive implementation is one window over every row,
    which serializes each hot host's billions of rows through a single
    task.  Instead:

      1. per-host counts (partial-agg'd, host cardinality ~ millions —
         broadcastable);
      2. map-side PREFILTER: keep a row only when the numeric value of its
         first 8 md5 hex digits falls below ``cap * safety / count`` — a
         superset of the final keep set w.h.p., ~``cap * safety`` rows per
         host regardless of host size;
      3. exact rank window over the prefiltered slice only;
      4. GUARD: any host whose prefilter kept fewer than
         ``min(cap, count)`` rows (astronomically rare at safety=2, but
         the correctness gate is exact) is re-ranked over its full rows.

    The md5-prefix prefilter is order-consistent with the full-md5 ranking
    (fixed-width lowercase hex: numeric order of the prefix == lexicographic
    order), so when the prefilter keeps >= cap rows their top-cap IS the
    global top-cap.

    Returns the input rows of the kept set (original columns).
    """
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    frac = F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / float(1 << 32)
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    cutoff = F.least(F.lit(1.0), F.lit(float(cap) * safety) / F.col("_n"))

    pre = (
        docs.join(F.broadcast(counts), group_col)
        .withColumn("_frac", frac)
        .filter(F.col("_frac") <= cutoff)
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    ranked = pre.withColumn("_rk", F.row_number().over(w))
    kept = ranked.filter(F.col("_rk") <= cap)

    # guard: hosts where the prefilter under-delivered get an exact re-rank.
    # Anchored on the COUNTS side (left join) — a host whose prefilter kept
    # zero rows is absent from `kept` entirely and must still be caught.
    kept_counts = kept.groupBy(group_col).agg(F.count(F.lit(1)).alias("_kept"))
    short = (
        counts.join(kept_counts, group_col, "left")
        .filter(F.coalesce("_kept", F.lit(0)) < F.least(F.lit(cap), F.col("_n")))
        .select(group_col)
    )
    exact = (
        docs.join(F.broadcast(short), group_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
    )
    out_cols = docs.columns
    return (
        kept.join(F.broadcast(short), group_col, "left_anti")
        .select(*out_cols)
        .unionByName(exact.select(*out_cols))
    )


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    scale: int = 1000,
) -> DataFrame:
    """CCNet-style head/middle/tail quality bucketing (Wenzek et al. 2020):
    per language, split documents into terciles of LM score — CCNet keeps
    "head" (lowest perplexity) for training and uses the cutoffs as fixed,
    precomputed per-language thresholds.  Here the LM score is the proven
    unigram-surprisal surrogate (q47) and the cutoffs come from the proven
    HDR log-linear quantile sketch (q95) at q=1/3 and q=2/3.

    Determinism/portability: surprisal is rounded to 6dp, then scaled to
    integer "milli-bits" via floor(x * scale) — the HDR sketch is
    all-integer from there, so both engines derive bit-identical cutoffs;
    the bucket compare (BIGINT <= exact-double midpoint) has no float risk.

    Scale shape: surprisal is the q47 distributed pipeline (vocab built and
    consumed with no collect); the histogram shuffles <= ~16*64 rows per
    language per partition REGARDLESS of corpus size (this is exactly why
    CCNet precomputes cutoffs instead of rank-windowing — an ntile() per
    language would sort each language inside one task); the cutoff table is
    languages x 2 rows, broadcast back.  No corpus-wide sort anywhere.

    Output: (id, lang, avg_surprisal, sbits, bucket).
    """
    from . import sketches, textstats

    s = textstats.unigram_surprisal(docs, id_col=id_col, text_col=text_col)
    sl = s.join(docs.select(id_col, lang_col), id_col).withColumn(
        "sbits", F.floor(F.col("avg_surprisal") * scale).cast("bigint")
    )
    terciles = (("q33", 1, 3), ("q67", 2, 3))
    cuts = sketches.hdr_quantiles(sl, "sbits", [lang_col], quantiles=terciles)
    cutsp = cuts.groupBy(lang_col).agg(
        F.max(F.when(F.col("qlabel") == "q33", F.col("est_value"))).alias("cut_head"),
        F.max(F.when(F.col("qlabel") == "q67", F.col("est_value"))).alias("cut_mid"),
    )
    return sl.join(F.broadcast(cutsp), lang_col).select(
        F.col(id_col),
        F.col(lang_col),
        "avg_surprisal",
        "sbits",
        F.when(F.col("sbits") <= F.col("cut_head"), F.lit("head"))
        .when(F.col("sbits") <= F.col("cut_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def strip_host_boilerplate(
    docs: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    lines_col: str = "lines",
    min_docs: int = 10,
    min_share: float = 0.3,
) -> DataFrame:
    """The SHIPPING half of host-level boilerplate handling: q86's
    ``host_boilerplate`` finds the repeated nav/footer/banner lines; this
    removes every occurrence of them from each document and re-assembles
    the cleaned text in original line order (the RefinedWeb/CCNet line-wise
    filter applied, not just reported).

    Semantics: a line is stripped when (host, line) is flagged boilerplate
    by ``host_boilerplate`` (>= min_share of the host's >= min_docs docs)
    and the line is non-blank.  Documents keep their row even when every
    line is stripped (clean_text = '') or the lines array is empty.

    Scale shape: one posexplode; the strip join is keyed (host, line) —
    boilerplate lines are hot by definition (>= 30% of a host's docs), so
    this is the AQE-skew-join case, never a broadcast of an unbounded
    per-host line vocabulary; re-assembly is one partial-agg'd
    groupBy(doc) whose state is bounded by document length.  No windows.

    Output: (id, host, clean_text, n_lines_kept, n_lines_removed).
    """
    bp = (
        host_boilerplate(
            docs,
            host_col=host_col,
            id_col=id_col,
            lines_col=lines_col,
            min_docs=min_docs,
            min_share=min_share,
        )
        .filter(F.col("boilerplate") & (F.trim(F.col("line")) != ""))
        .select("host", "line", F.lit(True).alias("_bp"))
    )
    pos = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col),
        F.posexplode_outer(F.col(lines_col)).alias("pos", "line"),
    )
    flagged = pos.join(bp, ["host", "line"], "left")
    keep = F.col("_bp").isNull() & F.col("line").isNotNull()
    return flagged.groupBy(id_col, "host").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct(F.col("pos"), F.col("line"))))
                ),
                lambda s: s.getField("line"),
            ),
            "\n",
        ).alias("clean_text"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_lines_kept"),
        F.sum(F.when(F.col("_bp").isNotNull(), 1).otherwise(0)).alias("n_lines_removed"),
    )
