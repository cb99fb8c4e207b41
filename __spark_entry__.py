"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over searchgov_spider_spark.queries — one queries() entry per
implemented operator family from SURVEY.md §2.  EVERY query has a DuckDB
oracle (rows + schema + value-hash): relational flows as ANSI SQL, kernel-
driven operators via oracles.build_dynamic_oracles() which computes expected
VALUES independently (golden rows, stdlib re-implementations, or checked-in
literals) and emits them as SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from searchgov_spider_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic-web crawl -> extraction -> enrichment -> corpus
    dedup against /root/testdata/sf0.001/documents.parquet."""
    return Q.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    from searchgov_spider_spark import oracles

    return dict(Q.ORACLES) | oracles.build_dynamic_oracles()
