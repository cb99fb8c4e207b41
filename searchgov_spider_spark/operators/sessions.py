"""Gap-based sessionization of event streams.

The batch counterpart of the crawl engine's time-ordered per-host
scheduling (reference ties: the DAP visit analytics the reference pulls
per domain — ``helpers/analytics.py`` aggregates visits over time — and
the politeness scheduler's per-host inter-arrival reasoning).  Given an
event log, assign every event to a session: a maximal run of one user's
events where consecutive gaps are <= ``gap_minutes``.  This is the
standard web-analytics/sessionization kernel every training-data
telemetry pipeline runs over interaction logs.

Scale shape: ONE shuffle, on the user key (`Window.partitionBy(user)`),
then everything — lag, the session-boundary flag, the running session
index, the per-session rollup — happens inside that partitioning; the
follow-up groupBy((user, session)) reuses the same hash partitioning so
AQE/EnsureRequirements inserts no second exchange.  No global window, no
driver state; per-user partitions are bounded by a user's own event
count (salt a pathological single-user firehose upstream if one exists).
Timestamps are compared as exact integer microseconds (``unix_micros``)
so engines cannot disagree in float space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup: (user_id, session_idx, n_events, start_us,
    end_us, duration_us, total_value).

    A new session starts at the first event of a user and at every event
    whose gap from the previous one exceeds ``gap_minutes`` (strictly
    greater — an exactly-at-gap event continues the session).
    ``order_col`` breaks equal-timestamp ties deterministically.
    ``session_idx`` is 1-based in event-time order.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    with_sess = (
        # parquet event times arrive as TIMESTAMP_NTZ; the cast interprets
        # the wall clock in the session tz (UTC, session.py:47), which is
        # exactly DuckDB's epoch_us() reading of the same naive value
        events.withColumn("_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
        .withColumn("_prev", F.lag("_us").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("_us") - F.col("_prev") > gap_us), 1
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("_new").over(run))
    )
    return with_sess.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
        F.round(F.sum(value_col), 2).alias("total_value"),
    )
