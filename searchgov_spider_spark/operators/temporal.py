"""Temporal joins over event streams: distributed as-of join.

The reference's analytics pull (``helpers/analytics.py`` — DAP visit
series per domain) and its freshness router both reason about "the latest
state at or before T"; the general kernel behind that shape is the as-of
join, which Spark's DataFrame API lacks as a built-in.  This implements it
as a composition of existing operators (the union + ignore-nulls
last_value trick), NOT a Python UDF.

Scale shape: ONE shuffle total — both sides union first (a free
concatenation, no data movement), then a single window partitioned by the
join key orders each key's merged timeline; ``last(..., ignorenulls)``
over the unbounded-preceding frame is an O(1)-state running value, so no
per-key buffering beyond Spark's window spill machinery.  Compare the
naive alternatives at 100 TB: a range join explodes to (left x right per
key) pairs, and a per-key ``mapInPandas`` merge pays Arrow transfer for
every row.  The union trick touches each row once, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with
    the greatest ``right_ts`` <= ``left_ts`` for the same ``on`` key
    (inclusive at equality — the DuckDB/pandas ``merge_asof`` backward
    default).  Left rows with no prior right row keep NULLs (left join).

    ``right_cols`` are the right-side payload columns to carry (default:
    every right column except the key and timestamp).  The right timestamp
    arrives as ``{right_ts}{suffix}`` so staleness (left_ts - right_ts) is
    computable.  If the right side has several rows at the same
    (key, timestamp), the payload columns are taken from a single
    deterministic winner per timestamp: the row with the greatest struct
    value under Spark's struct ordering (max over payload tuple) — callers
    wanting a different rule should pre-dedup.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    # one deterministic right row per (key, ts): max over the payload tuple
    r = (
        right.groupBy(F.col(on), F.col(right_ts).alias("_ts"))
        .agg(F.max(F.struct(*[F.col(c) for c in right_cols])).alias("_payload"))
        .select(
            on,
            "_ts",
            F.lit(1).alias("_is_r"),
            *[F.col(f"_payload.{c}").alias(f"_r_{c}") for c in right_cols],
        )
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_r"),
        *[F.lit(None).cast(r.schema[f"_r_{c}"].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    # left columns absent on the right side arrive as NULLs (free concat,
    # no shuffle)
    merged = l.unionByName(r, allowMissingColumns=True)

    # order right rows BEFORE left rows at the same timestamp (inclusive
    # equality): _is_r descending
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "*",
        F.last(F.when(F.col("_is_r") == 1, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias(f"{right_ts}{suffix}"),
        *[
            F.last(F.when(F.col("_is_r") == 1, F.col(f"_r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}" if c in left.columns else c)
            for c in right_cols
        ],
    )
    out_cols = list(left.columns) + [f"{right_ts}{suffix}"] + [
        (f"{c}{suffix}" if c in left.columns else c) for c in right_cols
    ]
    return filled.filter(F.col("_is_r") == 0).select(*out_cols)


def revisit_schedule(
    fetches: DataFrame,
    url_col: str = "url_id",
    ts_col: str = "ts",
    changed_col: str = "changed",
    min_days: float = 1.0,
    max_days: float = 365.0,
) -> DataFrame:
    """Cho & Garcia-Molina change-rate revisit scheduling over a fetch
    history (the incremental-crawler generalization of the reference's
    freshness router, ``search_gov_spiders/jobs/freshness.py`` semantics:
    "how often should this URL be re-fetched?").

    Input: one row per (url, fetch), with a boolean ``changed`` marking
    fetches that observed new content.  Per URL with n >= 2 visits spanning
    a positive interval, the Poisson change-rate estimator of Cho &
    Garcia-Molina (2003), "Estimating Frequency of Change":

        r_hat          = -ln((n - X + 0.5) / (n + 0.5))     (bias-corrected)
        lambda_per_day = r_hat / mean_interval_days
        next_days      = clamp(1 / lambda_per_day, min_days, max_days)

    Scale shape: ONE partial-agg'd groupBy on the URL key (count/sum/min/
    max all combine map-side); output is one row per URL, everything after
    the shuffle is per-row JVM arithmetic in whole-stage codegen.  No
    windows, no UDFs, no driver state — holds at 10^10 URLs.
    """
    us_per_day = F.lit(86400.0 * 1e6)
    agg = fetches.groupBy(url_col).agg(
        F.count("*").alias("n_visits"),
        F.sum(F.when(F.col(changed_col), 1).otherwise(0)).alias("n_changes"),
        (
            F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
            - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
        ).alias("_span_us"),
    )
    eligible = agg.filter((F.col("n_visits") >= 2) & (F.col("_span_us") > 0))
    interval = F.col("_span_us") / us_per_day / (F.col("n_visits") - 1)
    r_hat = -F.log(
        (F.col("n_visits") - F.col("n_changes") + 0.5) / (F.col("n_visits") + 0.5)
    )
    lam = r_hat / interval
    return eligible.select(
        url_col,
        "n_visits",
        "n_changes",
        F.round(interval, 6).alias("interval_days"),
        F.round(lam, 6).alias("lambda_per_day"),
        # X = 0 gives r_hat = 0 (never observed changing): schedule at the
        # horizon rather than dividing by zero under ANSI mode
        F.round(
            F.when(
                lam > 0, F.least(F.greatest(1.0 / lam, F.lit(min_days)), F.lit(max_days))
            ).otherwise(F.lit(max_days)),
            6,
        ).alias("next_fetch_days"),
    )
