"""Distributed FIFO sequence assignment (no single-partition window).

The frontier needs a dense global discovery sequence (the FIFO contract of
the reference's Redis queue, job_state/queue.py:4-15).  A naive
``row_number().over(Window.orderBy(...))`` collapses to ONE partition — a
non-starter at 10^10 rows.  This helper assigns the same numbers with a
two-pass range-partitioned scheme that stays fully distributed:

  1. range-repartition + sort within partitions by the order columns;
  2. persist, count rows per partition (tiny driver-side offset table);
  3. per-partition ``row_number`` (partition-local window — no extra
     shuffle) + broadcast-joined offset.

The persist between passes pins the range boundaries so both passes see the
same partitioning (range partitioning samples its input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


SMALL_BATCH_THRESHOLD = 65_536


def assign_seq_small(df: DataFrame, order_cols: list[str], seq_col: str = "seq", start: int = 0) -> DataFrame:
    """Single-partition window sequence — no pre-count action, for batches
    already known (hinted) to be small.  The caller reads the exact batch
    size afterwards from an Observation on the write."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(seq_col, (F.row_number().over(w) + F.lit(start) - 1).cast("long"))


def assign_seq_bucketed(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "seq",
    start: int = 0,
    bucket_col: str = "_pid",
) -> tuple[DataFrame, int, DataFrame]:
    """Dense global sequence over a precomputed MONOTONE bucket column —
    the zero-extra-job variant of :func:`assign_global_seq`.

    ``df[bucket_col]`` must be a non-decreasing integer function of the
    global ``order_cols`` order (the crawl engine derives it arithmetically
    from the frontier's dense parent-seq range, so no range-sampling pass
    is needed).  The single action here — the per-bucket count collect —
    doubles as the materialization of ``df``'s cache; the per-bucket window
    and the broadcast offset join stay lazy for the caller's write to
    execute.  Versus :func:`assign_global_seq` this removes, per batch: the
    pre-count job, the range-partitioner sampling job, and the second
    shuffled+sorted cache (the one bucket shuffle runs inside the caller's
    write).  The collect is O(buckets) rows at any input size.

    Returns ``(df_with_seq, total_rows, cache_handle)``; the caller
    unpersists the handle after materializing the result.
    """
    # r06: cache the POST-window rows and read the per-bucket counts as
    # max(row_number) — the bucket exchange + sort then runs inside THIS
    # job (which the engine overlaps with the concurrent documents write)
    # instead of re-running serially inside the frontier write; the write
    # job is left with cache-read -> tiny broadcast offset join -> write.
    #
    # The bucket exchange is an EXPLICIT repartition sized to the session's
    # shuffle parallelism: left to Window.partitionBy, AQE's size-based
    # coalescing (advisory 16m) folds a ~45 MB round batch into 1-3
    # post-shuffle partitions and the per-bucket SORT serializes onto that
    # many cores — measured 3.6 s/round of single-task sort at local[8]
    # (2M-page scaling phase) vs <0.5 s spread across the full width.
    # Partition count follows the session config, not a constant.
    spark_ = df.sparkSession
    try:
        n_parts = int(spark_.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # pragma: no cover - non-numeric session override
        n_parts = max(1, spark_.sparkContext.defaultParallelism)
    w = Window.partitionBy(bucket_col).orderBy(*[F.col(c) for c in order_cols])
    cached = (
        df.repartition(n_parts, F.col(bucket_col))
        .withColumn("_rn", F.row_number().over(w))
        .persist()
    )
    rows = cached.groupBy(bucket_col).agg(F.max("_rn").alias("cnt")).collect()
    counts = {r[bucket_col]: r["cnt"] for r in rows}
    total = sum(counts.values())
    if total == 0:
        return cached.drop("_rn").withColumn(seq_col, F.lit(start).cast("long")), 0, cached
    offsets: dict[int, int] = {}
    running = start
    for b in sorted(counts):
        offsets[b] = running
        running += counts[b]
    spark = df.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(int(b), int(o)) for b, o in offsets.items()], f"{bucket_col} int, _offset long"
        )
    )
    out = (
        cached.join(offsets_df, bucket_col)
        .withColumn(seq_col, (F.col("_offset") + F.col("_rn") - F.lit(1)).cast("long"))
        .drop("_rn", "_offset", bucket_col)
    )
    return out, total, cached


def monotone_bucket(
    col, lo: int, span: int, n_buckets: int
):
    """Arithmetic bucket id: ``floor((col - lo) * n_buckets / span)`` clamped
    to ``[0, n_buckets)``.  Monotone non-decreasing in ``col`` for ANY
    ``(lo, span)`` — clamping keeps out-of-range values at the end buckets —
    so :func:`assign_seq_bucketed` is CORRECT with estimated bounds; exact
    bounds only improve balance."""
    raw = F.floor(((col - F.lit(lo)) * F.lit(int(n_buckets))) / F.lit(int(max(span, 1))))
    return F.least(F.lit(int(n_buckets - 1)), F.greatest(F.lit(0), raw)).cast("int")


def assign_global_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
    small_threshold: int = SMALL_BATCH_THRESHOLD,
) -> tuple[DataFrame, int, DataFrame]:
    """Dense global sequence ``start..start+n-1`` in ``order_cols`` order.

    Returns ``(df_with_seq, total_rows, cache_handle)`` — the handle is the
    internally persisted intermediate; the caller unpersists it after
    materializing the result.  Small batches (< small_threshold) take a
    single-partition window; large batches take the two-pass
    range-partitioned scheme described above.  Deterministic either way.
    """
    spark = df.sparkSession
    df = df.persist()
    total = df.count()
    if total == 0:
        return df.withColumn(seq_col, F.lit(0).cast("long")), 0, df
    if total < small_threshold:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        out = df.withColumn(seq_col, (F.row_number().over(w) + F.lit(start) - 1).cast("long"))
        return out, total, df

    if num_partitions is None:
        num_partitions = max(1, spark.sparkContext.defaultParallelism)
    ranged = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols]).sortWithinPartitions(
        *order_cols
    )
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    df.unpersist()  # superseded by the ranged cache
    offsets = {}
    running = start
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    offsets_df = F.broadcast(
        spark.createDataFrame([(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long")
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(offsets_df, "_pid")
        .withColumn(seq_col, (F.col("_offset") + F.col("_rn") - F.lit(1)).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )
    return out, total, ranged
