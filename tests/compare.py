"""Order-insensitive result comparison between Spark and DuckDB results.

Mirrors the driver's correctness gate *through pandas*, because that is
what the driver does: it pulls both results into pandas DataFrames,
sorts columns by name, sorts rows by all columns, and hashes the values.
Two consequences the previous ``fetchall()``-based mirror missed:

- DuckDB promotes SUM(BIGINT) to HUGEINT, which lands in pandas as
  ``float64`` (or object) while Spark's long arrives as ``int64``. The
  values are numerically equal but the canonical serialization differs,
  so the driver records ``hash_match: false``. We therefore compare
  pandas dtype KINDS per column (int vs float vs object vs bool vs
  datetime) and fail on a mismatch — the fix is a CAST in the oracle.
- Array-typed columns crash pandas' row sort (``TypeError: unhashable
  type: 'numpy.ndarray'``) exactly as they crash the driver, so carrying
  one is an error here too — serialize arrays to strings in both engines.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import pandas as pd


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
    return v


def _dtype_kind(series: pd.Series) -> str:
    kind = series.dtype.kind
    if kind == "O":
        # Distinguish "object because strings" from "object because the
        # engine widened an integer past int64" — both engines must agree.
        sample = series.dropna()
        if len(sample) and all(isinstance(x, int) for x in sample.head(20)):
            return "i-as-object"
        return "O"
    # pandas nullable / datetime unit variations collapse to the kind letter
    if kind == "M":
        return "M"
    return kind


def _sorted_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # The driver sorts rows by all columns; unhashable cells (numpy arrays)
    # raise here exactly as they raise there.
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _canon_rows(df: pd.DataFrame) -> list[tuple]:
    rows = [
        tuple(_canon(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return rows


def compare_results(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    s_pdf = spark_df.toPandas()
    d_pdf = duck_rel.df()

    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(s_pdf.columns)} "
            f"duck={sorted(d_pdf.columns)}"
        )
        return problems
    if len(s_pdf) != len(d_pdf):
        problems.append(
            f"row count differs: spark={len(s_pdf)} duck={len(d_pdf)}"
        )

    for c in sorted(s_pdf.columns):
        sk, dk = _dtype_kind(s_pdf[c]), _dtype_kind(d_pdf[c])
        # int vs float is the HUGEINT trap; int64 vs uint64 etc. also differ
        if sk != dk:
            problems.append(
                f"dtype kind differs on {c!r}: spark={s_pdf[c].dtype}({sk}) "
                f"duck={d_pdf[c].dtype}({dk}) — add a CAST in the oracle"
            )
    if problems:
        return problems

    # Mirror the driver's row sort (crashes on unhashable cells, as it should)
    try:
        _sorted_frame(s_pdf)
        _sorted_frame(d_pdf)
    except TypeError as e:
        problems.append(
            f"driver canonicalizer would crash on this result: {e!r} — "
            "serialize array/map columns to strings in both engines"
        )
        return problems

    s_norm = _canon_rows(s_pdf)
    d_norm = _canon_rows(d_pdf)
    if s_norm != d_norm:
        d_set = set(d_norm)
        s_set = set(s_norm)
        diff_s = [r for r in s_norm if r not in d_set][:5]
        diff_d = [r for r in d_norm if r not in s_set][:5]
        problems.append(
            f"values differ; spark-only(first5)={diff_s} duck-only(first5)={diff_d}"
        )
    return problems
