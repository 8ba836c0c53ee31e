"""Projection helpers mirroring the reference's `get_columns_from_df`.

Reference semantics (`scripts/utils.py:66-77`): a candidate feature subset
arrives either as a positional 0/1 mask (`df.iloc[:, nonzero(mask)]`) or as
an explicit name list (`df[columns_list]`). Both are pure projections, so
in Spark they compile to column pruning at the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def project_by_mask(df: DataFrame, mask: Sequence[int]) -> DataFrame:
    """Positional 0/1-mask projection (ref: utils.py:71-74)."""
    if len(mask) != len(df.columns):
        raise ValueError(
            f"mask length {len(mask)} != column count {len(df.columns)}"
        )
    keep = [name for name, bit in zip(df.columns, mask) if bit]
    return df.select(*keep)


def project_by_names(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """Name-list projection (ref: utils.py:75-77)."""
    return df.select(*names)
