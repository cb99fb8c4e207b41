"""Retrieval-side corpus operators: offline BM25 ranking and RAG-style
fixed-stride token chunking.

Reference tie-in: the reference hands extracted documents to a search
backend for BM25 serving (searchgov-spider pushes documents into
OpenSearch — ``search_gov_spiders/pipelines.py:130-191`` i14y batches,
indexed downstream by Elasticsearch's BM25Similarity).  These operators
are the Spark-side equivalents a corpus build runs BEFORE serving: score
documents against a query offline (index-time ranking evaluation,
relevance-based corpus selection) and cut the fixed-stride overlapping
chunks a RAG/embedding pipeline consumes.  Formulas are public: BM25 per
Robertson & Zaragoza (2009), idf in Lucene's ``log(1 + (N-df+0.5)/(df+0.5))``
form.

Scale shape (the point of doing this in Spark):

- :func:`bm25_topk` touches the 100-TB corpus exactly twice, both
  map-shaped: one pass computes doc lengths (map-side partial agg to a
  1-row avgdl), one pass filters tokens to the |q| query terms BEFORE any
  shuffle, so the only groupBy runs over (docs-containing-a-query-term ×
  |q|) rows — corpus-size-independent for selective queries.  N, avgdl,
  df and idf are 1-row / |q|-row broadcasts; the final top-k is
  TakeOrderedAndProject, never a global sort.
- :func:`chunk_documents` is a pure map + explode (zero shuffles): chunk
  boundaries are arithmetic over the token array, so chunking 100 TB is
  embarrassingly parallel and whole-stage-codegen'd end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import TOKEN_PATTERN


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for ``query`` under BM25.

    score(d, q) = sum over distinct query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) (Lucene form; never
    negative).  Ranking is by the score ROUNDED to 6 decimals with
    ``id_col`` as the tie-break, so the order is reproducible across
    engines (unrounded last-ulp noise cannot reorder rows).

    Returns (id_col, n_terms_hit, bm25) — the k best documents.
    """
    terms = sorted(set(query.lower().split()))
    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"

    # 1-row corpus stats: N and avgdl (map-side partial agg on the big side)
    stats = docs.select(F.expr(f"size({toks})").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    terms_arr = "array(" + ", ".join(f"'{t}'" for t in terms) + ")"
    # filter to query terms BEFORE the shuffle: (doc, term) rows only exist
    # for docs that contain a query term.  dl rides the same rows (it is
    # functionally dependent on the doc id), so no join back against the
    # corpus-wide lengths table is ever needed.
    tf = (
        docs.select(
            F.col(id_col),
            F.expr(f"size({toks})").alias("dl"),
            F.explode(F.expr(f"filter({toks}, t -> array_contains({terms_arr}, t))")).alias(
                "term"
            ),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.round(F.sum("contrib"), 6).alias("bm25"),
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-stride overlapping token windows — the chunk table a RAG /
    embedding pipeline feeds to an encoder.

    Contract: a doc with n tokens (n > 0) yields
    ``ceil(max(n - chunk_size, 0) / stride) + 1`` chunks; chunk i covers
    tokens [i*stride, min(i*stride + chunk_size, n)) (0-indexed), so the
    final chunk may be short but every token is covered and consecutive
    chunks overlap by ``chunk_size - stride``.  Zero-token docs yield no
    chunks.

    Returns (id_col, chunk_idx, start_token, n_chunk_tokens, chunk_text,
    chunk_hash) — chunk_hash = md5(chunk_text) is the join key downstream
    chunk-level dedup uses.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    n_chunks = (
        f"CASE WHEN size(_toks) = 0 THEN 0 "
        f"WHEN size(_toks) <= {chunk_size} THEN 1 "
        f"ELSE cast(ceil((size(_toks) - {chunk_size}) / cast({stride} as double)) as int) + 1 END"
    )
    return (
        docs.select(F.col(id_col), F.expr(toks).alias("_toks"))
        .select(
            F.col(id_col),
            F.col("_toks"),
            F.explode(
                F.expr(f"CASE WHEN {n_chunks} > 0 THEN sequence(0, {n_chunks} - 1) "
                       "ELSE array() END")
            ).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            (F.col("chunk_idx") * stride).alias("start_token"),
            F.expr(f"array_join(slice(_toks, chunk_idx * {stride} + 1, {chunk_size}), ' ')").alias(
                "chunk_text"
            ),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            "start_token",
            F.expr(f"size(split(chunk_text, ' '))").alias("n_chunk_tokens"),
            "chunk_text",
            F.md5(F.col("chunk_text")).alias("chunk_hash"),
        )
    )
