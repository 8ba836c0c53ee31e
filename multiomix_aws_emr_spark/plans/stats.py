"""Catalog statistics + CBO plumbing: ANALYZE TABLE, stats inspection.

At 100 TB the difference between a broadcast and a 2-sided shuffle join,
or between the right and wrong join ORDER in a multiway plan, is made by
the optimizer's cardinality estimates — and those come from catalog
statistics. This module wraps the two halves the engine needs:

- :func:`analyze_table` — run ``ANALYZE TABLE ... COMPUTE STATISTICS
  [FOR COLUMNS ...]`` so the catalog carries rowCount/sizeInBytes and
  per-column ndv/null/min/max;
- :func:`plan_stats` — read the estimate Catalyst actually assigned to a
  DataFrame's optimized plan (rowCount requires
  ``spark.sql.cbo.enabled=true``; sizeInBytes is always present).

Production recipe: ANALYZE after every large write (or rely on a table
format that keeps stats on commit), enable CBO + join reorder
(``spark.sql.cbo.enabled``, ``spark.sql.cbo.joinReorder.enabled``), and
let size estimates pick broadcast sides instead of hand-placed hints.
Tests: tests/test_cbo.py.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def analyze_table(
    spark: SparkSession,
    table: str,
    columns: Optional[Sequence[str]] = None,
) -> None:
    """Compute table-level statistics (rowCount, sizeInBytes), plus
    per-column stats (ndv, nulls, min/max) when ``columns`` is given."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def catalog_row_count(spark: SparkSession, table: str) -> Optional[int]:
    """rowCount recorded in the catalog by ANALYZE (None before it runs)."""
    rows = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .filter("col_name = 'Statistics'")
        .collect()
    )
    if not rows:
        return None
    # e.g. "2199 bytes, 25 rows"
    text = rows[0]["data_type"]
    for part in text.split(","):
        part = part.strip()
        if part.endswith("rows"):
            return int(part.split()[0])
    return None


def plan_stats(df: DataFrame) -> dict:
    """The optimizer's estimate for this plan: {"size_bytes": int,
    "row_count": int | None}. row_count is populated when CBO is enabled
    and the underlying tables are ANALYZEd — exactly the signal join
    reordering and broadcast selection consume."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    return {
        "size_bytes": int(str(stats.sizeInBytes())),
        "row_count": int(str(rc.get())) if rc.isDefined() else None,
    }
