"""Z-order (Morton curve) clustered writes: multi-dimensional data skipping.

A sort on (a, b) clusters files perfectly on ``a`` but scatters ``b``; a
z-order sort interleaves the bits of both dimensions so every written
file covers a small rectangle of (a, b) space. Parquet min/max footer
stats on BOTH columns then prune files for 2-dimensional predicates —
the standard layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) that turns
a 100 TB scan with a point-in-box filter into a few file reads.

All JVM expressions: per-dimension min/max scaling from a broadcast
1-row aggregate (no driver collect), then a bit-interleave OR-chain —
whole-stage codegen, one range shuffle to lay files along the curve.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(scaled_cols: list, *, bits: int = 16) -> Column:
    """Morton code of pre-scaled integer columns (each in [0, 2^bits)).

    Bit b of dimension d lands at position ``b * ndims + d`` — an OR
    chain of ``bits * ndims`` shift/mask terms, all codegen-fused.
    """
    ndims = len(scaled_cols)
    terms = []
    for d, c in enumerate(scaled_cols):
        col = F.col(c) if isinstance(c, str) else c
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(col, b).bitwiseAND(F.lit(1)), b * ndims + d
                )
            )
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def scale_to_bits(col: Column, lo: Column, hi: Column, *, bits: int = 16) -> Column:
    """Min-max scale a numeric column into [0, 2^bits) integer space.
    Degenerate ranges (hi == lo) map to 0."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(frac * (1 << bits)).cast("long"), top.cast("long"))


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_by: list,
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the z-curve of ``zorder_by``.

    One aggregate pass computes per-dimension min/max (broadcast back as
    a 1-row cross join — no collect), one range shuffle orders rows by
    z-value, and files are cut along curve position so each covers a
    compact hyper-rectangle. The helper column set never reaches disk.
    """
    aggs = []
    for c in zorder_by:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    bounds = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(bounds))
    dims = [
        scale_to_bits(
            F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits=bits
        ).alias(f"_s_{c}")
        for c in zorder_by
    ]
    with_z = scaled.select(*df.columns, zvalue(dims, bits=bits).alias("_z"))
    (
        with_z.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
