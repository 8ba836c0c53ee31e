"""Order-insensitive result comparison between Spark and DuckDB results.

Mirrors the driver's correctness gate (row-count + column names +
order-insensitive value comparison after sorting columns by name). Values
are canonicalized (dates -> ISO strings, Decimal -> float, numpy -> python,
NaN == NaN) and compared exactly — the determinism rules (rounding, ms
timestamps, total tie-break orders) are what make exact float equality
achievable.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, float) and v == 0.0:
        return 0.0  # fold -0.0 (engines disagree on round(-eps) sign)
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    return v


def _normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_canon(row[i]) for i in order) for row in rows]
    out.sort(key=repr)
    return cols, out


def compare_results(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = duck_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")

    _, s_norm = _normalize(s_cols, s_rows)
    _, d_norm = _normalize(d_cols, d_rows)
    if s_norm != d_norm:
        diff_s = [r for r in s_norm if r not in set(d_norm)][:5]
        diff_d = [r for r in d_norm if r not in set(s_norm)][:5]
        problems.append(
            f"values differ; spark-only(first5)={diff_s} duck-only(first5)={diff_d}"
        )
    return problems
