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
