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


# T5-style span corruption (Raffel et al. 2020 §3.1.4): ~15% of tokens
# masked in short spans, each span replaced by one sentinel in the input and
# emitted after its sentinel in the target.  Deterministic block variant:
# positions partition into fixed BLOCK-sized blocks; block b of a doc masks
# the SPAN positions starting at offset h_b = md5(doc_id:b) % HMOD, so spans
# never cross blocks (no sequential overlap resolution -> fully
# vectorizable on both engines) and the corruption rate is SPAN/BLOCK = 15%.
SC_BLOCK = 20
SC_SPAN = 3
SC_HMOD = SC_BLOCK - SC_SPAN + 1  # span always fits inside its block


def span_corruption(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic T5-style span corruption over a documents table.

    Output per doc (docs with zero tokens drop — nothing to corrupt):
    (id, n_tokens, n_spans, n_masked, input_text, target_text) where
    input_text replaces each masked span with ``<extra_id_K>`` and
    target_text is the concatenation of ``<extra_id_K> masked tokens...``
    in span order — the exact (inputs, targets) pair shape a T5/UL2
    pretraining batch builder consumes.

    Scale shape: a PURE MAP — zero shuffles, zero joins, zero UDFs; every
    step (block hashes, span starts, per-position rewrite, target
    assembly) is codegen'd array algebra on the token array, so the
    operator runs at scan speed over 100 TB and the SQL oracle states the
    identical expressions on DuckDB list functions.  Span offsets derive
    from md5(doc_id:block), so the masking is reproducible at any
    partitioning and any corpus subset.
    """
    from .dedup import TOKEN_PATTERN

    B, S, H = SC_BLOCK, SC_SPAN, SC_HMOD
    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    d = (
        docs.select(F.col(id_col), F.expr(toks).alias("t"))
        .withColumn("n", F.expr("size(t)"))
        .filter(F.col("n") > 0)
        .withColumn("nb", F.expr(f"CAST(((n - 1) div {B}) + 1 AS INT)"))
        .withColumn(
            "hs",
            F.expr(
                f"transform(sequence(0, nb - 1), b -> "
                f"CAST(conv(substring(md5(concat(CAST({id_col} AS STRING), ':', "
                f"CAST(b AS STRING))), 1, 6), 16, 10) AS BIGINT) % {H})"
            ),
        )
        .withColumn(
            "starts",
            F.expr(
                f"filter(transform(sequence(0, nb - 1), "
                f"b -> b * {B} + element_at(hs, b + 1)), s -> s < n)"
            ),
        )
        .withColumn(
            "resid",
            F.expr(
                f"transform(sequence(0, n - 1), p -> CASE "
                f"WHEN (p % {B}) >= element_at(hs, CAST(p div {B} AS INT) + 1) "
                f"AND (p % {B}) < element_at(hs, CAST(p div {B} AS INT) + 1) + {S} "
                f"THEN (CASE WHEN (p % {B}) = element_at(hs, CAST(p div {B} AS INT) + 1) "
                f"THEN concat('<extra_id_', "
                f"CAST(array_position(starts, CAST(p AS BIGINT)) - 1 AS STRING), '>') "
                f"ELSE '' END) "
                f"ELSE element_at(t, p + 1) END)"
            ),
        )
    )
    return d.select(
        F.col(id_col),
        F.col("n").alias("n_tokens"),
        F.expr("size(starts)").alias("n_spans"),
        F.expr(
            f"aggregate(starts, 0, (acc, s) -> acc + least({S}, n - CAST(s AS INT)))"
        ).alias("n_masked"),
        F.expr("concat_ws(' ', filter(resid, x -> x <> ''))").alias("input_text"),
        F.expr(
            f"concat_ws(' ', flatten(transform(starts, s -> concat("
            f"array(concat('<extra_id_', "
            f"CAST(array_position(starts, s) - 1 AS STRING), '>')), "
            f"slice(t, CAST(s AS INT) + 1, least({S}, n - CAST(s AS INT)))))))"
        ).alias("target_text"),
    )
