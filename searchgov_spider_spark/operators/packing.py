"""Sequence packing: assign documents to fixed-size training context
windows (the GPT-style "concatenate and chunk" layout) with a DISTRIBUTED
prefix sum.

A training-data pipeline's last step lays token streams into ctx-sized
bins; the document -> bin assignment needs the global running token offset
of every document in a deterministic order.  The naive Spark spelling —
``sum() over (ORDER BY doc_id)`` with no partition key — moves the whole
corpus into ONE task, the classic global-window scale-killer.  This
implements the textbook two-pass distributed prefix sum instead:

1. range-partition by the order key (keys in partition i all sort before
   partition i+1 — correctness does NOT depend on where the sampled range
   boundaries land),
2. per-partition totals (one tiny row per partition) -> cumulative offsets
   via a window over that P-row table (single-partition is fine: P rows),
3. broadcast the offsets back and finish with a window PARTITIONED by the
   range-partition id — every task computes its own slice's running sum.

Total cost: one range shuffle + one broadcast; no task ever holds more
than its own partition.  Holds at 10^10 documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    docs: DataFrame,
    ctx: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_ranges: int = 32,
) -> DataFrame:
    """Per document (ordered by ``id_col``): global token offsets and the
    first/last ctx-bin it lands in under concatenate-and-chunk packing.

    Output: id, n_tokens, start_off, end_off (exclusive), bin_first,
    bin_last, spans_boundary.  Zero-token documents sit at a point offset:
    bin_last = bin_first, spans_boundary false.
    """
    d = docs.select(F.col(id_col), F.col(tokens_col).cast("long").alias("_nt"))
    d = d.repartitionByRange(num_ranges, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    totals = d.groupBy("_pid").agg(F.sum("_nt").alias("_tot"))
    # P rows total — the single-partition window here is over partition
    # COUNTS, not data
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    w_run = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = d.join(F.broadcast(offsets), "_pid").select(
        id_col,
        F.col("_nt").alias("n_tokens"),
        (F.col("_off") + F.sum("_nt").over(w_run)).alias("end_off"),
    )
    offs = packed.select(
        id_col,
        "n_tokens",
        (F.col("end_off") - F.col("n_tokens")).alias("start_off"),
        "end_off",
    )
    # integer division (`div`), not floor(double /): token offsets at
    # 10^10-doc scale exceed double's 2^53 exact-integer range
    bin_first = F.expr(f"start_off div {ctx}")
    # empty doc sits at a point offset: last token index = start_off
    bin_last = F.expr(f"greatest(end_off - 1, start_off) div {ctx}")
    return offs.select(
        id_col,
        "n_tokens",
        "start_off",
        "end_off",
        bin_first.alias("bin_first"),
        bin_last.alias("bin_last"),
        (bin_first != bin_last).alias("spans_boundary"),
    )
