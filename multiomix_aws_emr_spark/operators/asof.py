"""As-of join: for each anchor row, the latest prior lookup row per key.

Spark has no native ASOF JOIN. Two possible plans:

1. Range join + re-aggregate (the oracle's formulation): join anchors to
   every lookup row with ``lookup.ts <= anchor.ts`` then take ``max``.
   Correct, but O(anchors x lookups) per key — at 100 TB a user with 10k
   signups and 10k purchases materializes 10^8 intermediate rows.
2. Union + ordered window scan (implemented here): union both event roles,
   shuffle ONCE by key, sort each partition by time, and carry the last
   non-null lookup timestamp forward with ``last(..., ignorenulls=True)``.
   O(n log n) per key, no intermediate blowup, and the sort is
   spill-safe. Tie policy: a lookup at exactly the anchor's timestamp
   counts (<=), enforced by sorting lookups before anchors at equal ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_latest_prior(
    events: DataFrame,
    *,
    user_col: str,
    time_col: str,
    type_col: str,
    anchor_type: str,
    lookup_type: str,
    id_col: str,
    out_col: str,
) -> DataFrame:
    """Latest ``lookup_type`` timestamp at-or-before each ``anchor_type`` row.

    Returns (id_col, user_col, out_col); anchors with no prior lookup are
    dropped (inner-join semantics, matching the oracle).
    """
    tagged = events.filter(F.col(type_col).isin(anchor_type, lookup_type)).select(
        id_col,
        user_col,
        time_col,
        type_col,
        F.when(F.col(type_col) == lookup_type, F.col(time_col)).alias("_lookup_ts"),
        # lookups sort before anchors at equal timestamps => inclusive <=
        F.when(F.col(type_col) == anchor_type, F.lit(1)).otherwise(F.lit(0)).alias(
            "_is_anchor"
        ),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(time_col, "_is_anchor", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(out_col, F.last("_lookup_ts", ignorenulls=True).over(w))
        .filter((F.col(type_col) == anchor_type) & F.col(out_col).isNotNull())
        .select(id_col, user_col, out_col)
    )


def temporal_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    key_cols: list,
    time_col: str,
    payload_cols: list,
    how: str = "inner",
) -> DataFrame:
    """Temporal table join (Flink's FOR SYSTEM_TIME AS OF / SCD2 lookup):
    each fact row gets the dimension version valid at its timestamp — the
    latest dim row per key with ``dim.time <= fact.time`` — carrying the
    dimension's payload columns, not just the match timestamp.

    Same union + single-window-scan plan as :func:`asof_latest_prior`
    (one shuffle on the key, sort by time, ``last(payload, ignorenulls)``
    carries the current version forward), generalized to a struct payload.
    O(n log n) per key and spill-safe, vs the quadratic range-join +
    re-aggregate form. Ties at equal timestamps: dim sorts before fact
    (inclusive <=); multiple dim versions at the same (key, time) must be
    pre-deduplicated by the caller (e.g. ``max_by`` on a version id) —
    the window would otherwise pick the last in arbitrary intra-time
    order.

    ``how='inner'`` drops facts with no valid version; ``'left'`` keeps
    them with NULL payload.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    fact_cols = [c for c in fact.columns]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    d = dim.select(
        *key_cols,
        F.col(time_col).alias("_t"),
        payload.alias("_dim"),
        F.lit(0).alias("_is_fact"),
        *[F.lit(None).cast(fact.schema[c].dataType).alias(f"_f_{c}")
          for c in fact_cols],
    )
    f_rows = fact.select(
        *key_cols,
        F.col(time_col).alias("_t"),
        F.lit(None).cast(d.schema["_dim"].dataType).alias("_dim"),
        F.lit(1).alias("_is_fact"),
        *[F.col(c).alias(f"_f_{c}") for c in fact_cols],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_t", "_is_fact")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        d.unionByName(f_rows)
        .withColumn("_cur", F.last("_dim", ignorenulls=True).over(w))
        .filter(F.col("_is_fact") == 1)
    )
    if how == "inner":
        joined = joined.filter(F.col("_cur").isNotNull())
    return joined.select(
        *[F.col(f"_f_{c}").alias(c) for c in fact_cols],
        *[F.col("_cur").getField(p).alias(p) for p in payload_cols],
    )
