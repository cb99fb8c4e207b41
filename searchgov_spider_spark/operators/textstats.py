"""Text-analysis operators over a documents table (training-data pipeline).

Cheap stats (token counts, char classes) stay JVM-side; the heuristic
kernels (language-ID, quality, fingerprint) run as Arrow-batched pandas UDFs
wrapping searchgov_spider_spark.kernels.textproc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import udfs
from .dedup import TOKEN_PATTERN


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """JVM-side token/char statistics (portable to the SQL oracle)."""
    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    return docs.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").alias("n_unique_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round(
            F.expr(f"length(regexp_replace({text_col}, '[^a-zA-Z]', ''))") / F.greatest(F.length(text_col), F.lit(1)),
            6,
        ).alias("alpha_ratio"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), udfs.detect_language(F.col(text_col)).alias("detected_lang"))


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col),
        udfs.quality_score(F.col(text_col)).alias("quality"),
        udfs.token_count(F.col(text_col)).alias("n_tokens"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), udfs.document_fingerprint(F.col(text_col)).alias("fingerprint"))
