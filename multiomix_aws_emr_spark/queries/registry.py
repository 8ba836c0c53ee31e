"""Query registry: maps qid -> (spark, sf_dir) -> DataFrame plus oracle SQL.

Every declared query from SURVEY.md §2.2 registers itself here via the
:func:`query` decorator. ``ORACLES`` holds the DuckDB-runnable ANSI SQL for
the oracle-checked subset; rows-only queries register with ``oracle=None``.

The registered callable first applies the runtime conf baseline
(session.configure) so the driver's own SparkSession reads the fixtures
correctly, then delegates to the implementation.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from multiomix_aws_emr_spark.session import configure

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query (and its DuckDB oracle, if hash-checkable)."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
