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


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) — shift-robust delta estimation
# ---------------------------------------------------------------------------

CDC_GRAM = 3  # boundary decision window (tokens)
CDC_DIVISOR = 8  # expected chunk length = CDC_DIVISOR tokens


def cdc_chunks(
    docs: DataFrame,
    k: int = CDC_GRAM,
    divisor: int = CDC_DIVISOR,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking of the token stream: a chunk boundary
    falls AFTER position p whenever md5 of the k-gram ending at p hashes
    to 0 mod ``divisor`` — the rsync/LBFS gear-hash idea, with md5 of the
    joined gram standing in for the rolling hash so the rule is pure
    codegen AND restateable on DuckDB lists.

    Unlike fixed-stride chunking (retrieval.chunk_documents, q58), CDC
    boundaries depend only on LOCAL content: prepending a token to a
    recrawled page perturbs chunks up to the first surviving boundary and
    leaves every later chunk hash intact, which is what makes recrawl
    delta storage work.  Output: (id, chunk_idx, n_tokens, chunk_hash).

    Scale shape: a pure map + explode — zero shuffles, zero UDFs; the
    boundary scan, chunk slicing, and hashing are codegen'd array algebra
    over the token array, so chunking 100 TB is a scan."""
    from .dedup import TOKEN_PATTERN

    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    gram_hash = (
        f"CAST(conv(substring(md5(concat_ws(' ', slice(t, p - {k} + 1, {k}))), "
        f"1, 6), 16, 10) AS BIGINT) % {divisor}"
    )
    d = (
        docs.select(F.col(id_col), F.expr(toks).alias("t"))
        .withColumn("n", F.expr("size(t)"))
        .filter(F.col("n") > 0)
        .withColumn(
            "bnds",
            F.expr(
                f"CASE WHEN n >= {k} THEN filter(transform(sequence({k}, n), "
                f"p -> CASE WHEN {gram_hash} = 0 THEN p END), x -> x IS NOT NULL) "
                f"ELSE array() END"
            ),
        )
        .withColumn("starts", F.expr("concat(array(0), bnds)"))
        .withColumn("ends", F.expr("concat(bnds, array(n))"))
    )
    chunk = (
        "transform(sequence(1, size(starts)), i -> named_struct("
        "'chunk_idx', i - 1, "
        "'toks', slice(t, CAST(element_at(starts, i) AS INT) + 1, "
        "CAST(element_at(ends, i) - element_at(starts, i) AS INT))))"
    )
    return (
        d.select(F.col(id_col), F.explode(F.expr(chunk)).alias("c"))
        .filter(F.expr("size(c.toks) > 0"))
        .select(
            id_col,
            F.expr("CAST(c.chunk_idx AS INT)").alias("chunk_idx"),
            F.expr("size(c.toks)").alias("n_tokens"),
            F.expr("md5(concat_ws(' ', c.toks))").alias("chunk_hash"),
        )
    )


def cdc_delta(old_chunks: DataFrame, new_chunks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document chunk-reuse report between two chunked snapshots:
    (id, n_chunks_old, n_chunks_new, n_shared, reuse_ratio) where
    n_shared counts DISTINCT chunk hashes present in both versions and
    reuse_ratio = n_shared / distinct-new — the fraction of the recrawled
    document's content a delta store would NOT re-write.

    Scale shape: per-doc distinct + one equi-join on (id, chunk_hash) +
    partial-agg'd groupBys, all keyed by doc — uniform, broadcast-free,
    and bucketable on the doc key for exchange-free recurring diffs."""
    ho = old_chunks.select(id_col, "chunk_hash").distinct()
    hn = new_chunks.select(id_col, "chunk_hash").distinct()
    shared = ho.join(hn, [id_col, "chunk_hash"]).groupBy(id_col).agg(
        F.count("*").alias("n_shared")
    )
    co = old_chunks.groupBy(id_col).agg(F.count("*").alias("n_chunks_old"))
    cn = new_chunks.groupBy(id_col).agg(
        F.count("*").alias("n_chunks_new"),
        F.countDistinct("chunk_hash").alias("_nd_new"),
    )
    return (
        cn.join(co, id_col, "full_outer")
        .join(shared, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks_old", F.lit(0)).alias("n_chunks_old"),
            F.coalesce("n_chunks_new", F.lit(0)).alias("n_chunks_new"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce("n_shared", F.lit(0))
                / F.greatest(F.coalesce("_nd_new", F.lit(0)), F.lit(1)),
                6,
            ).alias("reuse_ratio"),
        )
    )
