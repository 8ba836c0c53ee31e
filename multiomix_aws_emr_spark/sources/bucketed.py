"""Bucketed tables: pre-shuffled storage for exchange-free co-located joins.

The 100 TB join strategy the brief's scale checklist names outright: when
two facts are repeatedly joined on the same key, pay the shuffle ONCE at
write time — ``bucketBy(n, key)`` hash-partitions rows into a fixed bucket
count inside each output directory — and every later join on that key
reads matching buckets side by side with NO Exchange in the plan (asserted
in tests/test_plans.py). The reference has no analog (it has no joins at
all, SURVEY.md §2.1 tail note); this is pure Spark-first closure surface.

Mechanics worth knowing at scale:
- bucket pruning + exchange elision require the join keys to equal the
  bucket columns and both sides to agree on the bucket count (Spark can
  also coalesce when one count divides the other —
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``sortBy`` within buckets additionally removes the sort from sort-merge
  joins — the write-amortized analog of an index;
- buckets are per-file-group, not per-cluster: the layout survives any
  executor count, which is what makes it durable across job runs;
- tables register in the session catalog with an explicit ``path`` so no
  warehouse directory is implied.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    *,
    table: str,
    path: str,
    by: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` as a bucketed parquet table at ``path`` and return the
    catalog-backed frame. ``by`` are the bucket (future join) columns."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *by)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables. When both were written with
    :func:`write_bucketed` on the join key and equal bucket counts, the
    physical plan contains no shuffle Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
