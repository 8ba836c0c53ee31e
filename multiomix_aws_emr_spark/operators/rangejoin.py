"""Binned range join: interval containment as an equi-join on bin keys.

``join_theta_range`` answers the band-join query with a broadcast nested
loop — right at any scale where one side fits in memory, wrong when both
sides are facts. This operator is the 100 TB path for the same semantics:
quantize the value domain into fixed-width bins, replicate each right-side
interval into the bins it overlaps (``sequence`` + ``explode`` — at most
``len(interval)/bin_width + 1`` rows), and equi-join on the bin id with
the exact range predicate as a post-join filter.

Properties that make this the scalable plan:
- the join is a plain shuffled equi-join on a compact long key — sort-merge
  or shuffled-hash, AQE-skew-splittable, never a cartesian stream;
- each left row carries exactly ONE bin (the bin containing its value), so
  a matching pair meets on exactly one key and the output needs no dedup;
- replication factor is bounded by interval length / bin_width — pick
  ``bin_width`` near the typical interval length so right rows expand to
  ~2 bins (the query below: ±500 band, width 1000, ≤ 2 bins);
- value-clustered data piles into few bins — AQE skew-join splitting
  handles it, or salt the bin key (operators/skew.py) for static plans.

This is the standard interval-join strategy of streaming engines (Flink's
interval join buckets by time) and warehouse range-join optimizations
(Databricks' ``RANGE_JOIN`` hint does exactly this binning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    *,
    left_val: str,
    right_lo,
    right_hi,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """left ⋈ right ON left.left_val BETWEEN right_lo AND right_hi.

    ``right_lo``/``right_hi`` are Column expressions over ``right`` (or
    column names); the result carries all columns of both inputs.
    """
    lo = F.col(right_lo) if isinstance(right_lo, str) else right_lo
    hi = F.col(right_hi) if isinstance(right_hi, str) else right_hi
    lb = left.withColumn("_rj_bin", F.floor(F.col(left_val) / F.lit(bin_width)))
    rb = right.withColumn(
        "_rj_bin",
        F.explode(
            F.sequence(F.floor(lo / F.lit(bin_width)), F.floor(hi / F.lit(bin_width)))
        ),
    )
    joined = lb.join(rb, "_rj_bin", how).filter(
        (F.col(left_val) >= lo) & (F.col(left_val) <= hi)
    )
    return joined.drop("_rj_bin")
