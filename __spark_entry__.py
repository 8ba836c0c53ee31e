"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7.1) at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full declared inventory of
SURVEY.md §2.2 implemented in the ``multiomix_aws_emr_spark`` package.
Rows-only queries (no cross-engine hashable oracle) appear in
``queries()`` but not in ``oracle_sql()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multiomix_aws_emr_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue by region/nation (scan -> 3 joins -> agg ->
    top-k) on /root/testdata/sf0.001."""
    return QUERIES["flagship_revenue_by_region"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    return dict(ORACLES)
