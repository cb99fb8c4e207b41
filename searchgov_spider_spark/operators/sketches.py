"""Mergeable cardinality sketches for crawl-scale distinct counting.

The reference counts distinct URLs per domain by materializing them in
Redis sets (helpers/redis, SURVEY.md §2 S12 family); at 100 TB the
equivalent question — "how many distinct URLs / docs / tokens does each
host contribute?" — cannot afford an exact per-group distinct shuffle.
HyperLogLog (Flajolet et al. 2007) answers it with m fixed-size registers
per group that combine map-side: the shuffle carries at most m rows per
(group, partition) regardless of corpus size, and sketches for different
days/segments merge by register-wise MAX, which is exactly what a partial
aggregate already does.

Everything here is deterministic and engine-portable by construction:
registers come from md5 hex strings via string ops only (no platform
float, no RNG), the harmonic sum is computed over INTEGERS (2^(cap-rho)
with a documented rho cap), and the only floating-point steps are one
final division and one optional ln() — so a DuckDB oracle can re-derive
the full register table and land on hash-identical output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# alpha_m for m = 256 (Flajolet et al. 2007, Fig. 3): 0.7213 / (1 + 1.079/m).
# Kept as a literal so the oracle states the identical constant.
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_ALPHA_256 = 0.7213 / (1.0 + 1.079 / 256.0)
# rho is capped so the harmonic sum is an exact BIGINT: sum of m terms
# 2^(cap-rho) <= 256 * 2^32 < 2^41.  A register ever reaching rho=32 would
# imply ~2^31 distinct keys hashing into ONE bucket — beyond any real
# corpus; the cap costs nothing and buys exact integer arithmetic.
HLL_RHO_CAP = 32

_HEX = "0123456789abcdef"


def _rho_expr(hash_col: str) -> str:
    """SQL for the HLL rank rho = 1 + (leading zero BITS of the hash suffix
    after the bucket prefix), capped at HLL_RHO_CAP.

    Works on the md5 hex string directly: count leading '0' hex chars
    (4 zero bits each), then add the zero bits inside the first non-zero
    hex digit (1->3, 2-3->2, 4-7->1, 8-f->0).  Pure string/CASE SQL that
    Spark codegens and DuckDB evaluates identically.
    """
    nchars = 32 - HLL_P // 4
    suffix = f"substring({hash_col}, {HLL_P // 4 + 1}, {nchars})"
    zc = f"length(regexp_extract({suffix}, '^(0*)', 1))"
    first = f"substring({suffix}, {zc} + 1, 1)"
    inner = (
        f"CASE WHEN {first} = '1' THEN 3 "
        f"WHEN {first} IN ('2','3') THEN 2 "
        f"WHEN {first} IN ('4','5','6','7') THEN 1 ELSE 0 END"
    )
    return (
        f"CAST(LEAST(CASE WHEN {zc} = {nchars} THEN {HLL_RHO_CAP} "
        f"ELSE 4 * {zc} + {inner} + 1 END, {HLL_RHO_CAP}) AS INT)"
    )


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-(group, bucket) HLL register table: bucket = first P bits of
    md5(key), rho = max rank observed in that bucket.

    This IS the mergeable sketch: registers for any union of inputs are
    the register-wise max, so `groupBy(...).agg(max(rho))` both builds and
    merges — partial aggregation makes the map-side output <= m rows per
    group per partition at any input size.
    """
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, HLL_P // 4), 16, 10).cast("int").alias("bucket")
    rho = F.expr(_rho_expr(f"md5(cast({key_col} as string))")).alias("rho")
    return (
        df.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    include_exact: bool = False,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate.

    Two aggregations: (group, bucket) -> max(rho) (key space m * n_groups,
    partial-agg'd), then group -> estimate over its <= m registers.  The
    harmonic mean is computed as the exact integer S = sum 2^(cap - rho)
    over PRESENT buckets; absent buckets are zero registers contributing
    2^cap each, folded in arithmetically from the present-bucket count.
    Small-range correction (linear counting m*ln(m/V)) applies below
    2.5*m with zero registers present, per the paper.

    Output: group_cols..., m, v_zero, est_distinct (round 4) and, when
    ``include_exact`` (testing/eval only — it is the exact distinct the
    sketch exists to avoid), exact_distinct + rel_err (round 4).
    """
    reg = hll_registers(df, key_col, group_cols)
    per_group = reg.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - rho)")).alias("_s_present"),
        F.count("*").alias("_n_present"),
    )
    m = HLL_M
    two_cap = float(1 << HLL_RHO_CAP)
    s_total = F.col("_s_present") + (F.lit(m) - F.col("_n_present")) * F.lit(1 << HLL_RHO_CAP)
    v_zero = (F.lit(m) - F.col("_n_present")).cast("int")
    e_raw = F.lit(HLL_ALPHA_256 * m * m * two_cap) / s_total.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    out = per_group.select(
        *group_cols,
        F.lit(m).alias("m"),
        v_zero.alias("v_zero"),
        F.round(est, 4).alias("est_distinct"),
    )
    if include_exact:
        exact = df.groupBy(*group_cols).agg(
            F.countDistinct(key_col).alias("exact_distinct")
        )
        out = out.join(exact, group_cols).select(
            *group_cols,
            "m",
            "v_zero",
            "est_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
    return out


def hll_oracle_sql(
    source_sql: str, key_expr: str, group_cols: list[str], include_exact: bool = False
) -> str:
    """DuckDB SQL re-deriving the full HLL pipeline independently: hex
    digits decoded with strpos (DuckDB has no conv), the same rho CASE,
    the same integer harmonic sum and correction constants."""
    g = ", ".join(group_cols)
    b1 = f"(strpos('{_HEX}', substring(h, 1, 1)) - 1) * 16"
    b2 = f"(strpos('{_HEX}', substring(h, 2, 1)) - 1)"
    nchars = 32 - HLL_P // 4
    suffix = f"substring(h, {HLL_P // 4 + 1}, {nchars})"
    zc = f"length(regexp_extract({suffix}, '^(0*)', 1))"
    first = f"substring({suffix}, {zc} + 1, 1)"
    inner = (
        f"CASE WHEN {first} = '1' THEN 3 "
        f"WHEN {first} IN ('2','3') THEN 2 "
        f"WHEN {first} IN ('4','5','6','7') THEN 1 ELSE 0 END"
    )
    rho = (
        f"LEAST(CASE WHEN {zc} = {nchars} THEN {HLL_RHO_CAP} "
        f"ELSE 4 * {zc} + {inner} + 1 END, {HLL_RHO_CAP})"
    )
    m = HLL_M
    two_cap = 1 << HLL_RHO_CAP
    # identical double on both sides: the Python product multiplies alpha
    # only by powers of two, so the mantissa is exactly alpha's
    numer = HLL_ALPHA_256 * m * m * float(two_cap)
    exact_cols = (
        f", exact_distinct, round(abs(est_distinct - exact_distinct) * 1.0 "
        f"/ exact_distinct, 4) AS rel_err"
        if include_exact
        else ""
    )
    exact_cte = (
        f", ex AS (SELECT {g}, count(DISTINCT {key_expr}) AS exact_distinct "
        f"FROM src GROUP BY {g})"
        if include_exact
        else ""
    )
    exact_join = f"JOIN ex USING ({g})" if include_exact else ""
    return f"""
        WITH src AS ({source_sql}),
        hashed AS (SELECT {g}, md5(CAST({key_expr} AS VARCHAR)) AS h FROM src),
        regs AS (
            SELECT {g}, {b1} + {b2} AS bucket, max({rho}) AS rho
            FROM hashed GROUP BY {g}, bucket),
        pg AS (
            SELECT {g},
                   sum((CAST(1 AS BIGINT) << ({HLL_RHO_CAP} - rho))) AS s_present,
                   count(*) AS n_present
            FROM regs GROUP BY {g}),
        est AS (
            SELECT {g},
                   {m} AS m,
                   CAST({m} - n_present AS INT) AS v_zero,
                   round(CASE WHEN (CAST({numer!r} AS DOUBLE)
                                    / (s_present + ({m} - n_present) * CAST({two_cap} AS BIGINT)))
                                   <= {2.5 * m}
                              AND ({m} - n_present) > 0
                         THEN {m}.0 * ln({m}.0 / ({m} - n_present))
                         ELSE CAST({numer!r} AS DOUBLE)
                              / (s_present + ({m} - n_present) * CAST({two_cap} AS BIGINT))
                         END, 4) AS est_distinct
            FROM pg){exact_cte}
        SELECT {g}, m, v_zero, est_distinct{exact_cols}
        FROM est {exact_join}
    """


# ---------------------------------------------------------------------------
# Count-Min frequency sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
# The reference tallies per-URL / per-token frequencies in Redis hashes; at
# web scale the vocabulary (tokens, n-grams, URL templates) has billions of
# distinct keys and an exact per-key groupBy shuffles all of them.  A
# Count-Min sketch answers point frequency queries with d*w counters TOTAL:
# the (hrow, bucket) aggregation partial-combines map-side, so the shuffle
# carries at most d*w rows per partition at ANY corpus size, and sketches of
# different segments merge by counter-wise SUM (again: exactly what a
# partial aggregate already does).  Estimates are BIASED HIGH, never low —
# cm_est >= true count always (each counter only gains from collisions).

CM_D = 4
CM_W = 1024


def _cm_pairs(key_col: str, d: int, w: int):
    """Array of (hrow, bucket) structs for one key: bucket_i = first 32 bits
    of md5(key || '#cm' || i) mod w.  md5-hex via conv — deterministic, no
    RNG, re-derivable in any engine."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("hrow"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#cm{i}"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("bigint")
                    % w
                )
                .cast("int")
                .alias("bucket"),
            )
            for i in range(d)
        ]
    )


def cm_sketch(df: DataFrame, key_col: str, d: int = CM_D, w: int = CM_W) -> DataFrame:
    """Build the d x w counter table over a key stream (one row per
    occurrence).  Output: hrow, bucket, cnt — at most d*w rows regardless of
    input size; sketches merge by groupBy(hrow, bucket).sum(cnt)."""
    return (
        df.select(F.explode(_cm_pairs(key_col, d, w)).alias("p"))
        .select("p.hrow", "p.bucket")
        .groupBy("hrow", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, d: int = CM_D, w: int = CM_W
) -> DataFrame:
    """Point-query the sketch for each probe key: min over the d counters
    (absent counter = 0).  The sketch is at most d*w rows, so it BROADCASTS
    and the probe side never shuffles — probing 10^9 keys is a map-side
    join plus one bounded groupBy on the probe key."""
    expl = probes.select(
        F.col(key_col), F.explode(_cm_pairs(key_col, d, w)).alias("p")
    ).select(key_col, "p.hrow", "p.bucket")
    return (
        expl.join(F.broadcast(sketch), ["hrow", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )


def _hex8_sql(h: str) -> str:
    """DuckDB: decode the first 8 hex chars of expression ``h`` positionally
    (no conv in DuckDB)."""
    return " + ".join(
        f"(strpos('{_HEX}', substring({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )


def cm_oracle_sql(
    source_sql: str,
    key_expr: str,
    probe_sql: str,
    d: int = CM_D,
    w: int = CM_W,
) -> str:
    """DuckDB SQL re-deriving sketch build + probe independently.
    ``source_sql`` yields the key stream; ``probe_sql`` must yield
    (token, exact_count) rows.  Output: token, exact_count, cm_est,
    overcount (cm_est - exact_count, provably >= 0)."""
    hx = _hex8_sql(f"md5(CAST({key_expr} AS VARCHAR) || '#cm' || CAST(i AS VARCHAR))")
    hxp = _hex8_sql("md5(token || '#cm' || CAST(i AS VARCHAR))")
    return f"""
        WITH src AS ({source_sql}),
        hashed AS (
            SELECT CAST(i AS INT) AS hrow, CAST(({hx}) % {w} AS INT) AS bucket
            FROM src, range({d}) t(i)),
        sk AS (SELECT hrow, bucket, count(*) AS cnt FROM hashed GROUP BY hrow, bucket),
        probes AS ({probe_sql}),
        pb AS (
            SELECT token, exact_count, CAST(i AS INT) AS hrow,
                   CAST(({hxp}) % {w} AS INT) AS bucket
            FROM probes, range({d}) t(i)),
        est AS (
            SELECT token, exact_count, min(coalesce(cnt, 0)) AS cm_est
            FROM pb LEFT JOIN sk USING (hrow, bucket)
            GROUP BY token, exact_count)
        SELECT token, exact_count, cm_est, cm_est - exact_count AS overcount
        FROM est
    """


# ---------------------------------------------------------------------------
# HDR log-linear histogram + quantiles (Tene, HdrHistogram)
# ---------------------------------------------------------------------------
# Mergeable quantile sketch with ZERO floating-point in the hot path: a
# value lands in bucket idx = o*16 + s where o = floor(log2(v)) computed
# EXACTLY as length(bin(v)) - 1 and s = (v*16 >> o) - 16 in [0,16) — pure
# integer string/shift ops that Spark and DuckDB evaluate identically (no
# ln(), no pow() per row, so no cross-engine ulp risk in the counts).
# Relative error is bounded by the sub-bucket width: <= 1/16 ~ 6.25%.
# Histograms merge by (group, idx) count-sum — one partial-agg'd shuffle of
# at most ~16*64 rows per group; quantile extraction then runs over the
# tiny histogram table, never the corpus.  The only floats are the final
# bucket-midpoint estimates, (33 + 2s) * 2^(o-5), which are EXACT doubles
# (integer times a power of two).

HDR_SUB = 16  # sub-buckets per octave; relative error <= 1/HDR_SUB

# (label, numerator, denominator): rank = ceil(q*n) computed as
# (num*n + den - 1) DIV den — integer on both engines, no 0.99-double drift.
HDR_QUANTILES = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def hdr_histogram(df: DataFrame, value_col: str, group_cols: list[str]) -> DataFrame:
    """Per-(group, idx) bucket counts.  Values are clamped to >= 1 (a
    zero/negative value lands in the unit bucket — documents with empty
    text still count)."""
    v = f"greatest(CAST({value_col} AS BIGINT), CAST(1 AS BIGINT))"
    o = f"(length(bin({v})) - 1)"
    idx = f"CAST({o} * {HDR_SUB} + (shiftright({v} * {HDR_SUB}, {o}) - {HDR_SUB}) AS INT)"
    return (
        df.select(*group_cols, F.expr(idx).alias("idx"))
        .groupBy(*group_cols, "idx")
        .agg(F.count("*").alias("cnt"))
    )


def hdr_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    include_exact: bool = False,
    quantiles: tuple = HDR_QUANTILES,
) -> DataFrame:
    """Per-group quantile estimates (default p50/p90/p99) from the HDR
    histogram; ``quantiles`` takes (label, numerator, denominator) triples
    so callers can ask for e.g. terciles without float-q drift.

    Rank-of-quantile is the type-1 definition: the value at row
    ceil(q*n) in ascending order.  The windowed cumulative sum and the
    quantile pick run over the histogram (<= ~16*64 rows per group); with
    ``include_exact`` the exact type-1 quantile rides along (eval only — a
    full per-group sort the sketch exists to avoid) with rel_err.

    Output: group_cols..., qlabel, n, est_value (+ exact_value, rel_err).
    """
    from pyspark.sql import Window

    hist = hdr_histogram(df, value_col, group_cols)
    w_cum = Window.partitionBy(*group_cols).orderBy("idx")
    w_all = Window.partitionBy(*group_cols)
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    qarr = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("qlabel"),
                F.lit(num).alias("num"),
                F.lit(den).alias("den"),
            )
            for lbl, num, den in quantiles
        ]
    )
    j = cum.withColumn("q", F.explode(qarr)).select(
        *group_cols,
        "idx",
        "cum",
        "n",
        "q.qlabel",
        F.expr("(q.num * n + q.den - 1) DIV q.den").alias("target"),
    )
    pick = (
        j.filter(F.col("cum") >= F.col("target"))
        .groupBy(*group_cols, "qlabel")
        .agg(F.min("idx").alias("idx"), F.max("n").alias("n"))
    )
    est = pick.select(
        *group_cols,
        "qlabel",
        "n",
        F.round(
            (F.lit(33) + F.lit(2) * (F.col("idx") % HDR_SUB))
            * F.pow(F.lit(2.0), (F.col("idx") / HDR_SUB).cast("int") - 5),
            4,
        ).alias("est_value"),
    )
    if not include_exact:
        return est
    vals = df.select(
        *group_cols,
        F.expr(f"greatest(CAST({value_col} AS BIGINT), CAST(1 AS BIGINT))").alias("v"),
    )
    w_rn = Window.partitionBy(*group_cols).orderBy("v")
    ranked = vals.withColumn("rn", F.row_number().over(w_rn)).withColumn(
        "n", F.count("*").over(Window.partitionBy(*group_cols))
    )
    jx = ranked.withColumn("q", F.explode(qarr)).select(
        *group_cols,
        "v",
        "rn",
        "q.qlabel",
        F.expr("(q.num * n + q.den - 1) DIV q.den").alias("target"),
    )
    exact = (
        jx.filter(F.col("rn") >= F.col("target"))
        .groupBy(*group_cols, "qlabel")
        .agg(F.min("v").alias("exact_value"))
    )
    return est.join(exact, [*group_cols, "qlabel"]).select(
        *group_cols,
        "qlabel",
        "n",
        "est_value",
        "exact_value",
        F.round(
            F.abs(F.col("est_value") - F.col("exact_value")) / F.col("exact_value"), 4
        ).alias("rel_err"),
    )


def hdr_oracle_sql(
    source_sql: str,
    value_expr: str,
    group_cols: list[str],
    include_exact: bool = False,
    quantiles: tuple = HDR_QUANTILES,
) -> str:
    """DuckDB SQL re-deriving the HDR pipeline independently: same
    bin()-length octave, same integer shift sub-bucket, same integer rank
    rule, same exact-double midpoint."""
    g = ", ".join(group_cols)
    v = f"greatest(CAST({value_expr} AS BIGINT), CAST(1 AS BIGINT))"
    qvals = ", ".join(f"('{l}', {n}, {d})" for l, n, d in quantiles)
    exact_cols = ", exact_value, round(abs(est_value - exact_value) / exact_value, 4) AS rel_err" if include_exact else ""
    exact_cte = (
        f""",
        ranked AS (
            SELECT {g}, v, row_number() OVER (PARTITION BY {g} ORDER BY v) AS rn,
                   count(*) OVER (PARTITION BY {g}) AS n
            FROM vals),
        ex AS (
            SELECT {g}, qlabel, min(v) AS exact_value
            FROM ranked, q
            WHERE rn >= (num * n + den - 1) // den
            GROUP BY {g}, qlabel)"""
        if include_exact
        else ""
    )
    exact_join = f"JOIN ex USING ({g}, qlabel)" if include_exact else ""
    return f"""
        WITH src AS ({source_sql}),
        vals AS (SELECT {g}, {v} AS v FROM src),
        b AS (
            SELECT {g},
                   CAST((length(bin(v)) - 1) * {HDR_SUB}
                        + ((v * {HDR_SUB} >> (length(bin(v)) - 1)) - {HDR_SUB}) AS INT) AS idx
            FROM vals),
        hist AS (SELECT {g}, idx, count(*) AS cnt FROM b GROUP BY {g}, idx),
        cum AS (
            SELECT {g}, idx, cnt,
                   sum(cnt) OVER (PARTITION BY {g} ORDER BY idx) AS cum,
                   sum(cnt) OVER (PARTITION BY {g}) AS n
            FROM hist),
        q(qlabel, num, den) AS (VALUES {qvals}),
        pick AS (
            SELECT {g}, qlabel, min(idx) AS idx, max(n) AS n
            FROM cum, q
            WHERE cum >= (num * n + den - 1) // den
            GROUP BY {g}, qlabel),
        est AS (
            SELECT {g}, qlabel, n,
                   round((33 + 2 * (idx % {HDR_SUB}))
                         * power(2.0, idx // {HDR_SUB} - 5), 4) AS est_value
            FROM pick){exact_cte}
        SELECT {g}, qlabel, CAST(n AS BIGINT) AS n, est_value{exact_cols}
        FROM est {exact_join}
    """


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with set operations
# ---------------------------------------------------------------------------
# Bar-Yossef et al. 2002 / Beyer et al. 2007: keep the k smallest hash
# values of a key stream; the k-th smallest, as a fraction v_k of the hash
# space, estimates distinct count as (k-1)/v_k.  Unlike HLL (union-only),
# KMV sketches support INTERSECTION: the k smallest of KMV(A) u KMV(B) is
# exactly KMV_k(A u B), and the fraction of those union-sketch hashes
# present in BOTH input sketches estimates Jaccard(A, B), hence
# |A n B| ~= J * |A u B| — the estimator a corpus-overlap / decontamination
# triage runs when both sides are too large for the exact q84 join.
#
# Determinism: hashes are md5 hex strings; the k-th value converts to a
# 48-bit integer positionally (exact in double), and the only floats are
# one division, one multiply, and the final rounds — Spark and DuckDB land
# on identical bits.

KMV_K = 256
_KMV_SPACE = float(1 << 48)  # 12 hex chars


def kmv_min_hashes(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = KMV_K,
    safety: float = 8.0,
) -> DataFrame:
    """Per-group k smallest md5 hashes of ``key_col`` (the KMV sketch),
    exact at any scale.

    Scale shape (the naive form is one window over every distinct hash,
    serializing each group through a single sort):

      1. distinct (group, hash) — one uniform-key shuffle;
      2. approx_count_distinct per group (JVM HLL++, partial-agg'd,
         deterministic) broadcast back as a prefilter threshold
         ``safety * k / n_est`` on the 32-bit hash prefix — ~``safety*k``
         survivors per group regardless of group size;
      3. exact rank window over the survivors only;
      4. GUARD: any group whose prefilter kept < k rows while its cutoff
         was < 1 (i.e. the prefilter actually dropped hashes) is re-ranked
         exactly over its full distinct hashes.  The threshold estimate
         therefore affects PERFORMANCE only, never the result.

    Hash-prefix order equals full-hash order (fixed-width lowercase hex),
    so a prefilter that keeps >= k rows keeps the true top-k.
    """
    from pyspark.sql import Window

    hashed = df.select(
        *group_cols, F.md5(F.col(key_col).cast("string")).alias("kmv_hash")
    ).distinct()
    est = hashed.groupBy(*group_cols).agg(
        F.approx_count_distinct("kmv_hash").alias("_n_est")
    )
    frac = F.conv(F.substring("kmv_hash", 1, 8), 16, 10).cast("double") / float(1 << 32)
    cutoff = F.least(F.lit(1.0), F.lit(float(k) * safety) / F.col("_n_est"))
    pre = (
        hashed.join(F.broadcast(est), group_cols)
        .withColumn("_cut", cutoff)
        .filter(frac <= F.col("_cut"))
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("kmv_hash").asc())
    kept = pre.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)

    # guard anchored on the estimate side (like curation.host_cap): a group
    # whose prefilter kept ZERO rows is absent from `kept` entirely and must
    # still be caught; its cutoff is recomputed from the broadcast estimate.
    kept_counts = kept.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_kept"))
    short = (
        est.join(kept_counts, group_cols, "left")
        .filter(
            (F.coalesce(F.col("_kept"), F.lit(0)) < k)
            & (F.lit(float(k) * safety) / F.col("_n_est") < 1.0)
        )
        .select(*group_cols)
    )
    exact = (
        hashed.join(F.broadcast(short), group_cols)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
    )
    out = [*group_cols, "kmv_hash", "_rk"]
    return (
        kept.join(F.broadcast(short), group_cols, "left_anti")
        .select(*out)
        .unionByName(exact.select(*out))
        .withColumnRenamed("_rk", "kmv_rank")
    )


def _kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """distinct-count estimate from a KMV sketch: exact row count when the
    sketch holds < k hashes (the stream had fewer distinct keys than k),
    else (k-1) / v_k with v_k = k-th hash as a 48-bit fraction."""
    vk = F.conv(F.substring(F.max("kmv_hash"), 1, 12), 16, 10).cast("double")
    n = F.count(F.lit(1))
    return sketch.groupBy(*group_cols).agg(
        n.alias("sketch_size"),
        F.round(
            F.when(n < k, n.cast("double")).otherwise(
                F.lit(float((k - 1)) * _KMV_SPACE) / vk
            ),
            4,
        ).alias("distinct_est"),
    )


def kmv_set_ops(
    df: DataFrame,
    corpus_col: str,
    key_col: str,
    corpus_a: str,
    corpus_b: str,
    k: int = KMV_K,
) -> DataFrame:
    """Distinct / union / intersection / Jaccard estimates between two key
    streams from their KMV sketches — ONE row out.

    The corpora are scanned exactly once (the sketch build); every set
    operation below runs on the <= 2k sketch rows: the k smallest of
    KMV(A) u KMV(B) is exactly KMV_k(A u B); Jaccard is the fraction of
    those union hashes present in both input sketches; the intersection
    estimate is J * |A u B|-est.
    """
    from pyspark.sql import Window

    two = df.filter(F.col(corpus_col).isin([corpus_a, corpus_b]))
    sk = kmv_min_hashes(two, key_col, [corpus_col], k=k).persist()

    per = _kmv_estimate(sk, [corpus_col], k)
    a_est = per.filter(F.col(corpus_col) == corpus_a).select(
        F.col("sketch_size").alias("_na"), F.col("distinct_est").alias("distinct_a_est")
    )
    b_est = per.filter(F.col(corpus_col) == corpus_b).select(
        F.col("sketch_size").alias("_nb"), F.col("distinct_est").alias("distinct_b_est")
    )

    union_sk = (
        sk.select("kmv_hash")
        .distinct()
        .withColumn("_rk", F.row_number().over(Window.orderBy(F.col("kmv_hash").asc())))
        .filter(F.col("_rk") <= k)
    )
    a_hashes = sk.filter(F.col(corpus_col) == corpus_a).select("kmv_hash")
    b_hashes = sk.filter(F.col(corpus_col) == corpus_b).select("kmv_hash")
    in_both = (
        union_sk.join(a_hashes, "kmv_hash", "left_semi")
        .join(b_hashes, "kmv_hash", "left_semi")
    )
    vk = F.conv(F.substring(F.max("kmv_hash"), 1, 12), 16, 10).cast("double")
    un = union_sk.agg(
        F.count(F.lit(1)).alias("_nu"),
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")).otherwise(
                F.lit(float((k - 1)) * _KMV_SPACE) / vk
            ),
            4,
        ).alias("union_est"),
    )
    both = in_both.agg(F.count(F.lit(1)).alias("_nboth"))

    row = a_est.crossJoin(b_est).crossJoin(un).crossJoin(both)
    jacc = F.round(F.col("_nboth") / F.col("_nu"), 6)
    return row.select(
        F.lit(k).alias("k"),
        "distinct_a_est",
        "distinct_b_est",
        "union_est",
        jacc.alias("jaccard_est"),
        F.round(jacc * F.col("union_est"), 4).alias("intersection_est"),
    )


def _hex12_sql(h: str) -> str:
    """DuckDB: decode the first 12 hex chars of expression ``h``
    positionally (16^11 < 2^63, exact BIGINT)."""
    return " + ".join(
        f"(strpos('{_HEX}', substring({h}, {i + 1}, 1)) - 1) * {16 ** (11 - i)}"
        for i in range(12)
    )


def kmv_oracle_sql(
    source_sql: str,
    corpus_expr: str,
    key_expr: str,
    corpus_a: str,
    corpus_b: str,
    k: int = KMV_K,
) -> str:
    """DuckDB SQL re-deriving the full KMV pipeline independently (exact
    per-corpus k smallest via QUALIFY — no prefilter needed single-node;
    the guard makes the distributed side exactly equal)."""
    est = (
        f"CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE) "
        f"ELSE {float(k - 1) * _KMV_SPACE!r} / ({_hex12_sql('max(kmv_hash)')}) END"
    )
    return f"""
        WITH src AS ({source_sql}),
        hashed AS (
            SELECT DISTINCT {corpus_expr} AS corpus,
                   md5(CAST({key_expr} AS VARCHAR)) AS kmv_hash
            FROM src WHERE {corpus_expr} IN ('{corpus_a}', '{corpus_b}')),
        sk AS (
            SELECT corpus, kmv_hash FROM hashed
            QUALIFY row_number() OVER (PARTITION BY corpus ORDER BY kmv_hash) <= {k}),
        per AS (SELECT corpus, round({est}, 4) AS distinct_est FROM sk GROUP BY corpus),
        usk AS (
            SELECT kmv_hash FROM (SELECT DISTINCT kmv_hash FROM sk)
            QUALIFY row_number() OVER (ORDER BY kmv_hash) <= {k}),
        un AS (SELECT count(*) AS nu, round({est}, 4) AS union_est
               FROM (SELECT kmv_hash FROM usk) sk),
        ib AS (
            SELECT count(*) AS nboth FROM usk
            WHERE kmv_hash IN (SELECT kmv_hash FROM sk WHERE corpus = '{corpus_a}')
              AND kmv_hash IN (SELECT kmv_hash FROM sk WHERE corpus = '{corpus_b}'))
        SELECT {k} AS k,
               (SELECT distinct_est FROM per WHERE corpus = '{corpus_a}') AS distinct_a_est,
               (SELECT distinct_est FROM per WHERE corpus = '{corpus_b}') AS distinct_b_est,
               un.union_est,
               round(ib.nboth / un.nu, 6) AS jaccard_est,
               round(round(ib.nboth / un.nu, 6) * un.union_est, 4) AS intersection_est
        FROM un, ib
    """
