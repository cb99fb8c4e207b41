"""Crawl snapshot diffing: added / removed / changed detection between
two corpus snapshots.

Reference tie-in: the reference's recrawl machinery is built on exactly
this question — the freshness router re-indexes documents whose content
changed since the last crawl (``search_gov_crawler/elasticsearch/``
freshness pull), and the sitemap delta flow (flows.py:37 here, U1 in
SURVEY §2) diffs URL *lists*; this operator diffs the *content* of two
full snapshots, the kernel behind incremental re-indexing, recrawl
prioritization, and "what changed this week" corpus reports.

Scale shape: ONE full-outer hash equi-join on the document key — the
only shuffle, and it disappears entirely when both snapshots are written
bucketed on the key (storage/tables.py's bucketed layout: two snapshots
of the same crawl share the bucketing, so the diff is a zipper merge
with ZERO exchanges).  Change detection compares 128-bit content digests
computed map-side, so the wide text column never rides the shuffle —
at 100 TB the join moves ~48 bytes/row, not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document diff of two snapshots: (id_col, status, old_hash,
    new_hash) with status in {'added', 'removed', 'changed'} —
    unchanged documents are dropped (they are the overwhelming mass of a
    real recrawl; emitting them would make the delta corpus-sized).

    Hashes are md5 of the text; NULL on the side the document is absent
    from.  Deterministic, order-independent.
    """
    o = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("old_hash"))
    n = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("new_hash"))
    joined = o.join(n, on=id_col, how="full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(id_col, "status", "old_hash", "new_hash")
    )


def delta_summary(delta: DataFrame) -> DataFrame:
    """Roll the delta up to (status, n) counts — the one-line recrawl
    report.  Partial-agg'd single groupBy over the already-small delta."""
    return delta.groupBy("status").agg(F.count("*").alias("n"))
