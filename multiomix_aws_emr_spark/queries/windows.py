"""Window functions: ranking, lag/lead, running frames, range frames.

Reference analog: the deterministic form of the black-hole arg-best
selection (`scripts/metaheuristics.py:169-192`, R14) with the
fewer-features tie-break (`:670-681`, R15) — re-expressed as ranking
windows with total tie-break orders (SURVEY.md §7.5.3).

Scale shape: every window here shuffles once on its partition key and
sorts within partitions; no driver materialization. Skewed partition keys
(a user with millions of events) are the risk at 100 TB — mitigated by
AQE skew handling for the shuffle and, for pathological keys, pre-bucketed
layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.queries.registry import query
from multiomix_aws_emr_spark.sources.tables import events_v, load, with_events_v


@query(
    "window_rank",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn, "
        "CAST(RANK() OVER w AS INTEGER) AS rk, "
        "CAST(DENSE_RANK() OVER w AS INTEGER) AS drk "
        "FROM orders WINDOW w AS "
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)"
    ),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@query(
    "window_topk_per_group",
    oracle=(
        "SELECT * FROM ("
        "SELECT o_orderstatus, o_orderkey, ROUND(o_totalprice, 2) AS price_r, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn "
        "FROM orders) t WHERE rn <= 3"
    ),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (ref R14/R15 deterministic form). Catalyst rewrites
    rank-filter patterns into per-partition top-k (WindowGroupLimit) — no
    full sort of each group."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderstatus",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price_r"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead",
    oracle=with_events_v(
        "SELECT event_id, user_id, "
        "ROUND(LAG(value) OVER w, 2) AS prev_v, "
        "ROUND(LEAD(value) OVER w, 2) AS next_v "
        "FROM events_v WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)"
    ),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_v(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.lag("value").over(w), 2).alias("prev_v"),
        F.round(F.lead("value").over(w), 2).alias("next_v"),
    )


@query(
    "window_running_sum",
    oracle=with_events_v(
        "SELECT event_id, user_id, "
        "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_v "
        "FROM events_v"
    ),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-order running sum — deterministic order makes the float sum
    bit-stable across engines (SURVEY.md §7.5.2)."""
    ev = events_v(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("cum_v")
    )


@query(
    "window_moving_avg",
    oracle=with_events_v(
        "SELECT event_id, user_id, "
        "ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3 "
        "FROM events_v"
    ),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_v(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("ma3")
    )


@query(
    "window_range_frame",
    oracle=with_events_v(
        "SELECT event_id, user_id, "
        "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_ms "
        "RANGE BETWEEN 60000 PRECEDING AND CURRENT ROW) AS n_60s "
        "FROM events_v"
    ),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 60-second event count — the batch analog of a sliding
    stream aggregation, expressed as a RANGE frame over epoch-ms."""
    ev = events_v(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms").rangeBetween(-60000, 0)
    return ev.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_60s")
    )


@query(
    "window_ntile",
    oracle=(
        "SELECT o_orderkey, CAST(NTILE(4) OVER w AS INTEGER) AS tile, "
        "ROUND(PERCENT_RANK() OVER w, 6) AS pr, "
        "ROUND(CUME_DIST() OVER w, 6) AS cd "
        "FROM orders WINDOW w AS "
        "(PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)"
    ),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — quartile bucketing (``ntile``) plus
    normalized ranks (``percent_rank``/``cume_dist``) under a total
    deterministic order (price desc, orderkey tiebreak). Same single
    shuffle-and-sort per partition key as the ranking windows; ntile adds
    only a partition-count pass."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("tile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "window_first_last",
    oracle=with_events_v(
        "SELECT event_id, user_id, "
        "FIRST_VALUE(event_id) OVER w AS first_ev, "
        "LAST_VALUE(event_id) OVER "
        "(PARTITION BY user_id ORDER BY ts_ms, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ev, "
        "NTH_VALUE(event_id, 2) OVER w AS second_ev "
        "FROM events_v WINDOW w AS "
        "(PARTITION BY user_id ORDER BY ts_ms, event_id)"
    ),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window values: first/last/nth event per user under a
    total order. last_value needs the full-partition frame (the default
    frame ends at CURRENT ROW — a classic correctness trap both engines
    share, made explicit here); first/nth use the default growing frame."""
    ev = events_v(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_ev"),
        F.last("event_id").over(wfull).alias("last_ev"),
        F.nth_value("event_id", 2).over(w).alias("second_ev"),
    )


_SESSIONIZE_ORACLE = (
    "WITH events_v AS (SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, "
    "event_type, value FROM events), "
    "g AS (SELECT user_id, ts_ms, value, "
    "CASE WHEN ts_ms - LAG(ts_ms) OVER w >= 1800000 THEN 1 ELSE 0 END AS brk "
    "FROM events_v WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)), "
    "s AS (SELECT user_id, ts_ms, value, "
    "SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms "
    "ROWS UNBOUNDED PRECEDING) AS session_no FROM g) "
    "SELECT user_id, MIN(ts_ms) AS session_start_ms, "
    "MAX(ts_ms) + 1800000 AS session_end_ms, "
    "CAST(COUNT(*) AS BIGINT) AS n_events, "
    "ROUND(SUM(value), 2) AS sum_value "
    "FROM s GROUP BY user_id, session_no"
)


@query("window_sessionize", oracle=_SESSIONIZE_ORACLE)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap — Spark's native
    ``session_window`` aggregate in BATCH mode (the same operator the
    streaming path uses, so batch backfill and live sessions share
    semantics). One shuffle on user_id; merging overlapping per-event
    windows is done inside the aggregate, not via a sort + gaps-and-
    islands window pass — the oracle recomputes it with the classic
    lag/cumsum island formulation, proving the two agree. Session end =
    last event + gap (Spark's convention, mirrored in the oracle)."""
    ev = events_v(spark, sf_dir)
    ts = F.timestamp_millis(F.col("ts_ms"))
    return (
        ev.groupBy(
            "user_id", F.session_window(ts, "30 minutes").alias("_w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_millis("_w.start").alias("session_start_ms"),
            F.unix_millis("_w.end").alias("session_end_ms"),
            "n_events",
            "sum_value",
        )
    )


_LATEST_ORACLE = (
    "WITH events_v AS (SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, "
    "event_type, value FROM events), "
    "r AS (SELECT user_id, event_id, ts_ms, value, "
    "ROW_NUMBER() OVER (PARTITION BY user_id "
    "ORDER BY ts_ms DESC, event_id DESC) AS rn FROM events_v) "
    "SELECT user_id, event_id AS last_event_id, ts_ms AS last_ts_ms, "
    "ROUND(value, 2) AS last_value FROM r WHERE rn = 1"
)


@query("dedup_latest_version", oracle=_LATEST_ORACLE)
def dedup_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup (CDC compaction / upsert resolution) as a
    SINGLE hash aggregate: ``max_by(payload struct, (ts, id) struct)``
    picks each user's most recent event with lexicographic struct
    comparison — no per-partition sort, no window pass, map-side partial
    combine. The oracle states the same contract as the textbook
    row_number()=1 formulation; at 100 TB the aggregate form shuffles one
    pre-combined row per key per map task instead of sorting every row.
    """
    ev = events_v(spark, sf_dir)
    payload = F.struct("event_id", "ts_ms", "value")
    order = F.struct("ts_ms", "event_id")
    latest = ev.groupBy("user_id").agg(F.max_by(payload, order).alias("_p"))
    return latest.select(
        "user_id",
        F.col("_p.event_id").alias("last_event_id"),
        F.col("_p.ts_ms").alias("last_ts_ms"),
        F.round(F.col("_p.value"), 2).alias("last_value"),
    )
