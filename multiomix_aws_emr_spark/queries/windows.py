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


_WDISTINCT_ORACLE = (
    "WITH events_v AS (SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, "
    "event_type FROM events) "
    "SELECT event_id, user_id, "
    "CAST(COUNT(DISTINCT event_type) OVER (PARTITION BY user_id "
    "ORDER BY ts_ms, event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) "
    "AS INTEGER) AS n_distinct_types_10 "
    "FROM events_v"
)


@query("window_distinct_count", oracle=_WDISTINCT_ORACLE)
def window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a sliding window (how varied were the user's
    last 10 actions). Spark has no COUNT(DISTINCT) window — the
    idiomatic rewrite is ``size(collect_set() OVER w)``, which keeps the
    set in window state (bounded by the frame length, so safe for ROWS
    frames; never use it UNBOUNDED over high-cardinality values). The
    oracle uses DuckDB's native windowed distinct count, pinning the
    rewrite's semantics."""
    ev = events_v(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(-9, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias(
            "n_distinct_types_10"
        ),
    )


_FUNNEL_ORACLE = (
    "WITH events_v AS (SELECT epoch_ms(ts) AS ts_ms, user_id, event_type "
    "FROM events), "
    "u AS (SELECT user_id, "
    "MIN(CASE WHEN event_type = 'signup' THEN ts_ms END) AS t_signup, "
    "MIN(CASE WHEN event_type = 'view' THEN ts_ms END) AS t_view, "
    "MIN(CASE WHEN event_type = 'purchase' THEN ts_ms END) AS t_purchase "
    "FROM events_v GROUP BY user_id) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_signed_up, "
    "CAST(COUNT(CASE WHEN t_view > t_signup THEN 1 END) AS BIGINT) "
    "AS n_viewed_after, "
    "CAST(COUNT(CASE WHEN t_view > t_signup AND t_purchase > t_view THEN 1 "
    "END) AS BIGINT) AS n_purchased_after, "
    "ROUND(COUNT(CASE WHEN t_view > t_signup AND t_purchase > t_view THEN 1 "
    "END) / CAST(COUNT(*) AS DOUBLE), 4) AS conversion "
    "FROM u WHERE t_signup IS NOT NULL"
)


@query("funnel_conversion", oracle=_FUNNEL_ORACLE)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup -> later view -> later purchase): per-user
    first-touch timestamps from ONE conditional-aggregation pass, then
    the stage predicates compose as ordinary boolean columns — no
    sequential pattern-matching engine needed for first-touch funnels,
    and the single shuffle is the per-user aggregate. (Multi-touch/
    windowed funnels are where MATCH_RECOGNIZE-style logic would enter.)
    """
    ev = events_v(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_ms"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "view", F.col("ts_ms"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts_ms"))).alias(
            "t_purchase"
        ),
    )
    u = u.filter(F.col("t_signup").isNotNull())
    viewed = F.col("t_view") > F.col("t_signup")
    purchased = viewed & (F.col("t_purchase") > F.col("t_view"))
    return u.agg(
        F.count(F.lit(1)).alias("n_signed_up"),
        F.count(F.when(viewed, 1)).alias("n_viewed_after"),
        F.count(F.when(purchased, 1)).alias("n_purchased_after"),
        F.round(
            F.count(F.when(purchased, 1)) / F.count(F.lit(1)).cast("double"), 4
        ).alias("conversion"),
    )


_COHORT_ORACLE = (
    "WITH events_v AS (SELECT epoch_ms(ts) AS ts_ms, user_id, event_type "
    "FROM events), "
    "cohort AS (SELECT user_id, "
    "MIN(CASE WHEN event_type = 'signup' THEN ts_ms END) // 604800000 "
    "AS signup_week FROM events_v GROUP BY user_id), "
    "activity AS (SELECT DISTINCT e.user_id, c.signup_week, "
    "(e.ts_ms // 604800000) - c.signup_week AS week_offset "
    "FROM events_v e JOIN cohort c ON e.user_id = c.user_id "
    "WHERE c.signup_week IS NOT NULL "
    "AND (e.ts_ms // 604800000) >= c.signup_week) "
    "SELECT signup_week, CAST(week_offset AS BIGINT) AS week_offset, "
    "CAST(COUNT(*) AS BIGINT) AS n_active "
    "FROM activity GROUP BY 1, 2"
)


@query("cohort_retention", oracle=_COHORT_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by signup week, counted
    once per (cohort, weeks-since-signup) they were active in — the
    product-analytics staple. The cohort table is one row per user and
    broadcasts onto the event scan; the distinct collapses (user, week)
    duplicates before the final count, all on the same user-keyed
    shuffle."""
    ev = events_v(spark, sf_dir)
    wk = 604800000
    # integer `div`, not double `/` + cast: a correctly-rounded double
    # quotient can truncate to a different bucket than exact floor div
    cohort = (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                "min(CASE WHEN event_type = 'signup' THEN ts_ms END) "
                f"div {wk}"
            ).alias("signup_week")
        )
        .filter(F.col("signup_week").isNotNull())
    )
    act = (
        ev.join(F.broadcast(cohort), "user_id")
        .select(
            "user_id",
            "signup_week",
            (F.expr(f"ts_ms div {wk}") - F.col("signup_week")).alias(
                "week_offset"
            ),
        )
        .filter(F.col("week_offset") >= 0)
        .distinct()
    )
    return act.groupBy("signup_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


_GAPFILL_ORACLE = (
    "WITH events_v AS (SELECT epoch_ms(ts) AS ts_ms, user_id, value "
    "FROM events), "
    "daily AS (SELECT user_id, ts_ms // 86400000 AS day, "
    "CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS sum_value "
    "FROM events_v WHERE user_id < 10 GROUP BY 1, 2), "
    "spans AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 "
    "FROM daily GROUP BY user_id), "
    "grid AS (SELECT s.user_id, unnest(generate_series(s.d0, s.d1)) AS day "
    "FROM spans s) "
    "SELECT g.user_id, CAST(g.day AS BIGINT) AS day, "
    "COALESCE(d.n, 0) AS n, COALESCE(d.sum_value, 0.0) AS sum_value "
    "FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day"
)


@query("timeseries_gapfill", oracle=_GAPFILL_ORACLE)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series from sparse events (users < 10): per-user
    min..max day grids generated with ``sequence`` + ``explode`` —
    server-side, proportional to the span, never a driver-side calendar
    — left-joined back so silent days appear as explicit zeros (what
    downstream window/forecast math needs). Grid generation and the
    sparse aggregate share the user-keyed shuffle."""
    ev = events_v(spark, sf_dir)
    daily = (
        ev.filter(F.col("user_id") < 10)
        .groupBy("user_id", F.expr("ts_ms div 86400000").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


_PATTERN_ORACLE = (
    "WITH events_v AS (SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, "
    "event_type FROM events), "
    "seq AS (SELECT event_id, user_id, ts_ms, event_type, "
    "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) "
    "AS prev_type, "
    "LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) "
    "AS prev_ts FROM events_v) "
    "SELECT event_id, user_id, ts_ms - prev_ts AS view_to_purchase_ms "
    "FROM seq WHERE event_type = 'purchase' AND prev_type = 'view'"
)


@query("pattern_view_then_purchase", oracle=_PATTERN_ORACLE)
def pattern_view_then_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-event sequence detection (a view immediately followed by
    a purchase, per user) — the lag-comparison core of MATCH_RECOGNIZE-
    style pattern queries, as one window pass. Longer fixed patterns
    chain more lags on the SAME window spec (one WindowExec); variable-
    length patterns escalate to applyInPandasWithState (streaming/
    stateful.py)."""
    ev = events_v(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    seq = ev.select(
        "event_id",
        "user_id",
        "ts_ms",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts_ms").over(w).alias("prev_ts"),
    )
    return seq.filter(
        (F.col("event_type") == "purchase") & (F.col("prev_type") == "view")
    ).select(
        "event_id",
        "user_id",
        (F.col("ts_ms") - F.col("prev_ts")).alias("view_to_purchase_ms"),
    )


_RFM_ORACLE = (
    "WITH events_v AS (SELECT epoch_ms(ts) AS ts_ms, user_id, event_type, "
    "value FROM events), "
    "rfm AS (SELECT user_id, MAX(ts_ms) AS last_ts, "
    "CAST(COUNT(*) AS BIGINT) AS frequency, "
    "ROUND(SUM(value), 2) AS monetary "
    "FROM events_v WHERE event_type = 'purchase' GROUP BY user_id) "
    "SELECT user_id, frequency, monetary, "
    "CAST(NTILE(4) OVER (ORDER BY last_ts DESC, user_id) AS INTEGER) AS r_quartile, "
    "CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS INTEGER) AS f_quartile, "
    "CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS INTEGER) AS m_quartile "
    "FROM rfm"
)


@query("analytics_rfm_segments", oracle=_RFM_ORACLE)
def analytics_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: one purchase aggregate per user, then
    three ntile(4) windows assign recency/frequency/monetary quartiles
    (user_id tiebreak makes the quartile boundaries deterministic). The
    three windows share no partition key (global ordering) — fine at
    user-cardinality scale since the input is already one row per user;
    at extreme cardinality swap ntile for percent_rank thresholds, which
    need no global sort."""
    ev = events_v(spark, sf_dir)
    rfm = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts_ms").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
    )
    wr = Window.orderBy(F.col("last_ts").desc(), "user_id")
    wf = Window.orderBy(F.col("frequency").desc(), "user_id")
    wm = Window.orderBy(F.col("monetary").desc(), "user_id")
    return rfm.select(
        "user_id",
        "frequency",
        "monetary",
        F.ntile(4).over(wr).alias("r_quartile"),
        F.ntile(4).over(wf).alias("f_quartile"),
        F.ntile(4).over(wm).alias("m_quartile"),
    )


_SCD2_ORACLE = """
WITH events_v AS (
  SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type FROM events
), p AS (
  SELECT user_id, event_id, ts_ms FROM events_v
  WHERE event_type = 'purchase'
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       ts_ms AS valid_from,
       LEAD(ts_ms) OVER w AS valid_to
FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
"""


@query("window_scd2_intervals", oracle=_SCD2_ORACLE)
def window_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 reconstruction: each purchase
    event opens a validity interval [valid_from, valid_to) closed by the
    user's next purchase (NULL while current) — the standard
    event-log -> dimension-history transform. ONE window specification
    serves both the version number and the interval bound, so the plan
    is a single partition-sort pass per user; the event_id in the sort
    key makes same-millisecond ties deterministic across engines."""
    from pyspark.sql.window import Window

    from multiomix_aws_emr_spark.sources.tables import events_v

    p = (
        events_v(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return p.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("ts_ms").alias("valid_from"),
        F.lead("ts_ms").over(w).alias("valid_to"),
    )
