"""Query registry: maps qid -> (spark, sf_dir) -> DataFrame plus oracle SQL.

Every declared query from SURVEY.md §2.2 registers itself here via the
:func:`query` decorator. ``ORACLES`` holds the DuckDB-runnable ANSI SQL for
the oracle-checked subset; rows-only queries register with ``oracle=None``.

The registered callable first applies the runtime conf baseline
(session.configure) so the driver's own SparkSession reads the fixtures
correctly, then delegates to the implementation.

Wide-state shapes additionally carry a ``sizing_hint`` — a callable
``(sf_dir) -> widest-exchange byte estimate`` (usually
``session.parquet_bytes`` of the shuffled fact table, times the fan-out
for exploding plans). Before delegating, the wrapper routes the estimate
through ``session.sized_shuffle_partitions`` (BASELINE.md rule 2) and
sets ``spark.sql.shuffle.partitions`` for this execution; unhinted
queries restore the session's baseline count, so a hint never leaks into
the next query of a shared-session suite. Sub-GB estimates floor at the
baseline, so fixture-scale plans are byte-identical with or without the
hint — the hint only acts at real volume (the 1000x probes), where it
reproduces the hand-tuned winners hands-free. Scoping caveat: the conf
is read at EXECUTION time, so the build-then-execute-one-query-at-a-time
pattern (the driver, bench.py, the probes) is the supported shape;
interleaving the *execution* of several declared queries built from the
same session runs all of them at the last-built query's count.
``SPARK_GRAFT_SIZING_HINTS=0`` disables hints (the A/B lever).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from multiomix_aws_emr_spark.session import (
    configure,
    executor_task_share_bytes,
    sized_shuffle_partitions,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
SIZING_HINTS: dict[str, Callable[[str], int]] = {}

_SHUFFLE_CONF = "spark.sql.shuffle.partitions"


def _apply_sizing(
    spark: SparkSession, hint: Optional[Callable[[str], int]], sf_dir: str
) -> None:
    """Set the execution-time shuffle partition count for one declared
    query: rule-2-sized when a hint estimate clears the session baseline,
    the baseline otherwise (which also un-does a previous query's hint)."""
    sc = spark.sparkContext
    baseline = getattr(sc, "_maes_shuffle_baseline", None)
    if baseline is None:
        baseline = spark.conf.get(_SHUFFLE_CONF)
        sc._maes_shuffle_baseline = baseline
    n = None
    if hint is not None and os.environ.get("SPARK_GRAFT_SIZING_HINTS") != "0":
        try:
            # Floor/wave on the SESSION's configured parallelism, not the
            # machine core count: "sf0.1 plans unchanged" means a sub-GB
            # estimate must yield exactly the baseline the session runs at.
            # Per-task share comes from the executor sizing confs when set
            # (multi-JVM masters), else the env driver heap (single-JVM).
            n = sized_shuffle_partitions(
                hint(sf_dir),
                cores=int(baseline),
                per_task_share_bytes=executor_task_share_bytes(spark),
            )
        except (OSError, ValueError):
            n = None  # unreadable path / non-numeric baseline: keep baseline
    if n is not None and n > int(baseline):
        spark.conf.set(_SHUFFLE_CONF, str(n))
    elif spark.conf.get(_SHUFFLE_CONF) != baseline:
        spark.conf.set(_SHUFFLE_CONF, baseline)


def fact_bytes(table: str, fanout: float = 1.0) -> Callable[[str], int]:
    """Sizing-hint factory: on-disk bytes of ``{sf_dir}/{table}.parquet``
    times ``fanout`` (the row-expansion multiplier for exploding plans —
    shingles, array explode — per the rule-2 contract that
    ``shuffle_bytes`` estimates the bytes ENTERING the widest exchange)."""
    from multiomix_aws_emr_spark.session import parquet_bytes

    def hint(sf_dir: str) -> int:
        return int(parquet_bytes(os.path.join(sf_dir, f"{table}.parquet")) * fanout)

    return hint


def query(
    name: str,
    oracle: Optional[str] = None,
    sizing_hint: Optional[Callable[[str], int]] = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query (and its DuckDB oracle, if hash-checkable).

    ``sizing_hint``: optional ``(sf_dir) -> bytes`` estimate of the widest
    exchange for wide-state shapes — see the module docstring."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            _apply_sizing(spark, sizing_hint, sf_dir)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        if sizing_hint is not None:
            SIZING_HINTS[name] = sizing_hint
        return wrapped

    return deco
