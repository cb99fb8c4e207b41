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


# BPE-ish pre-tokenizer shape (GPT-2-style word/number/punct runs with an
# optional leading space), restricted to constructs both Java regex and
# DuckDB's RE2 support identically (no lookarounds): a training-data token
# counter that tracks subword-tokenizer input segmentation far better than
# a plain \\w+ split.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+"


def bpe_token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts, fully JVM-side (codegen regex).

    n_ws_tokens = \\S+ runs (the whitespace tokenizer); n_bpe_tokens = GPT-2
    style pre-token segments; bpe_per_ws approximates the subword blow-up
    factor used for corpus token budgeting.
    """
    ws = f"size(regexp_extract_all({text_col}, '\\\\S+', 0))"
    bpe = f"size(regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}', 0))"
    return docs.select(
        F.col(id_col),
        F.expr(ws).alias("n_ws_tokens"),
        F.expr(bpe).alias("n_bpe_tokens"),
        F.round(F.expr(bpe) / F.greatest(F.expr(ws), F.lit(1)), 6).alias("bpe_per_ws"),
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
