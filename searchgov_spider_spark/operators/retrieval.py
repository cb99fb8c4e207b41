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


def inverted_index(
    docs: DataFrame,
    block_span: int = 1 << 62,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Offline inverted-index shard build — the Spark-side counterpart of
    the indexing the reference delegates to its search backend (documents
    pushed to OpenSearch, ``pipelines.py:130-191``, indexed into Lucene
    postings downstream).  Emits one row per (term, doc-id block):

        (term, block, df, total_tf, postings)

    where ``postings`` is the classic sorted posting list serialized as
    ``"doc:tf,doc:tf,..."`` (doc-id ascending — delta-encodable), ``df``
    counts the block's documents and ``total_tf`` its occurrences.

    ``block_span`` bounds a single output row: documents land in block
    ``doc_id div block_span``, so a stop-word's posting list splits into
    fixed doc-id-range blocks instead of concentrating a 100-TB corpus's
    hottest key into one reducer (the groupBy key (term, block) stays
    bounded at ``block_span`` docs regardless of term frequency — the
    skew answer, like Lucene's segment split).  Contiguous doc-id ranges
    keep blocks mergeable by concatenation.  The default span (2^62) is
    "one block" for small corpora; term-level df/total_tf are then exact
    per row, and at scale a second vocabulary-sized agg over this output
    sums them per term.

    Scale shape: explode never crosses partitions, so all of a doc's
    occurrences are co-located and the (id, term) partial agg collapses
    them map-side — the first shuffle carries one row per (doc, distinct
    term), not per occurrence.  The second shuffle groups (term, block),
    skew-bounded by ``block_span``; sort_array orders each posting list
    inside its reducer without a global sort.  No UDFs, no collect.
    """
    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    tf = (
        docs.select(F.col(id_col), F.explode(F.expr(toks)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.withColumn("block", (F.col(id_col) / F.lit(block_span)).cast("long"))
        .groupBy("term", "block")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col(id_col), F.col("tf")))),
                    lambda s: F.concat_ws(":", s[id_col].cast("string"), s["tf"].cast("string")),
                ),
                ",",
            ).alias("postings"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` terms by smoothed tf-idf — the corpus-side
    keyword extraction the reference performs per page with nltk
    (``helpers/summarize.py`` top-10 keywords; cited for parity, computed
    here corpus-relative instead of stopword-relative):

        tfidf = tf * ln((N + 1) / (df + 1))   (add-one smoothed, never 0/0)

    ranked per document by (tfidf desc, term asc) — a total order, so the
    top-k cut is reproducible across engines.

    Returns (id_col, term, tf, df, tfidf, rank) with rank 1..k.

    Scale shape: the (doc, term, tf) table is built once (explode stays
    partition-local, partial agg collapses occurrences map-side); df is a
    vocabulary-sized groupBy of THAT table (second shuffle, uniform keys);
    the join back is term-to-term on the same vocabulary — hot stop-word
    terms are exactly the AQE skew-join case and broadcast is wrong here
    (a 100-TB corpus's vocabulary outgrows an executor).  The final top-k
    is a per-doc window over the (doc) partitioning, never a global sort.
    N is a 1-row broadcast.
    """
    from pyspark.sql import Window

    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    tf = (
        docs.select(F.col(id_col), F.explode(F.expr(toks)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_n: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of named rankers (Cormack, Clarke &
    Buettcher 2009):  rrf(d) = sum over rankers r of 1 / (k + rank_r(d)),
    with a ranker contributing 0 for documents outside its list.  This is
    the standard hybrid-retrieval combiner (OpenSearch/Elasticsearch ship
    it as their hybrid query mode — the serving side of the reference's
    i14y push); fusing an offline BM25 ranking with a dense cosine
    ranking is how a corpus build evaluates hybrid relevance.

    ``rankings`` maps ranker name -> DataFrame of (id_col, rank_col) with
    rank 1-based; each ranker's rank is carried through as
    ``{name}_rank`` (NULL when absent).  Output is the fused top
    ``top_n`` by (rrf desc, id asc), rrf rounded to 6 decimals so
    last-ulp float noise cannot reorder engines.

    Scale shape: ranker outputs are top-k lists — tiny by construction —
    so every join here is broadcastable; the heavy lifting happened
    upstream in the rankers themselves (bm25_topk / cosine_topk each do
    the one corpus-scale pass).  Full-outer joins on the id keep
    documents surfaced by any ranker.
    """
    import functools

    sides = [
        df.select(
            F.col(id_col), F.col(rank_col).cast("long").alias(f"{name}_rank")
        )
        for name, df in rankings.items()
    ]
    fused = functools.reduce(
        lambda a, b: a.join(b, on=id_col, how="full_outer"), sides
    )
    rrf = functools.reduce(
        lambda acc, name: acc
        + F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"{name}_rank")), F.lit(0.0)
        ),
        rankings.keys(),
        F.lit(0.0),
    )
    return (
        fused.withColumn("rrf", F.round(rrf, 6))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(top_n)
    )
