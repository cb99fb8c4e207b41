"""Corpus-curation operators: benchmark decontamination and deterministic
stratified sampling (training-data pipeline ops beyond the reference's own
surface, per the build brief's LLM-pipeline mandate).

Scale notes (the 100-TB design point):
- ``decontaminate`` joins the 100-TB training side against the *eval* n-gram
  set, which is small by construction (benchmarks are 10^3-10^5 documents ->
  ~10^6-10^7 distinct n-grams, a few hundred MB of strings).  The eval side
  is therefore ``broadcast()`` — the scan side streams map-side with no
  shuffle of the big table; the only shuffle is the per-doc hit aggregation,
  keyed by doc id (uniform, unskewed).
- ``stratified_sample`` is a pure map-side filter: md5 of the document id is
  compared against a per-stratum hex cutoff joined in via a broadcast rates
  dimension.  Zero shuffles, fully whole-stage-codegen, and the sample is
  DETERMINISTIC — re-running at any cluster size or partitioning yields the
  identical row set (unlike ``df.sample``, which is partition-layout
  dependent), which is what reproducible training-data builds require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag training documents sharing any token ``n``-gram with an
    eval/benchmark set — the n-gram-overlap decontamination rule used by
    GPT-3/PaLM-style data pipelines (13-gram in the GPT-3 appendix; ``n`` is
    a parameter here and the test/oracle default is 8 to suit short
    synthetic docs).

    Returns one row per training doc: (id, n_hit_ngrams, contaminated),
    where ``n_hit_ngrams`` counts DISTINCT n-grams of the doc that appear
    anywhere in the eval set.  Documents shorter than ``n`` tokens
    contribute their whole-document gram (same convention as the dedup
    shingler, so a verbatim short eval doc still hits).
    """
    grams = shingles_col(text_col, n)
    eval_grams = eval_docs.select(F.explode(grams).alias("gram")).distinct()
    doc_grams = docs.select(F.col(id_col), F.explode(grams).alias("gram")).distinct()
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hit_ngrams", F.lit(0)).alias("n_hit_ngrams"),
            (F.coalesce("n_hit_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    cutoffs: dict[str, str],
    default_cutoff: str = "0000",
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """Deterministic hash-based stratified sampling: keep a document when
    the first 4 hex chars of ``md5(cast(id as string))`` sort strictly below
    the stratum's cutoff.  ``cutoffs`` maps stratum value -> 4-hex-char
    cutoff ("8000" keeps ~50%, "4000" ~25%, "ffff"+1 is unreachable so
    "ffff" keeps ~99.998%); strata absent from the map use
    ``default_cutoff`` ("0000" = drop).

    The rates table is a broadcast dimension (tiny by construction), the
    predicate is codegen string comparison — no shuffle, no RNG, identical
    output at any partitioning.
    """
    spark = docs.sparkSession
    rates = spark.createDataFrame(
        [(k, v) for k, v in sorted(cutoffs.items())],
        f"{strata_col} string, cutoff string",
    )
    bucket = F.expr(f"substring(md5(cast({id_col} as string)), 1, 4)")
    return (
        docs.join(F.broadcast(rates), strata_col, "left")
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.coalesce("cutoff", F.lit(default_cutoff)))
        .drop("cutoff")
    )
