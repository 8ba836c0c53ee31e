"""Aggregations: global, grouped, distinct, stats, rollup/cube/sets, pivot.

Reference analogs: the per-host dict-loop aggregation
(`scripts/metaheuristics.py:617-645`, R19) and the idle-time mean/std
(`:707-714`, R20 — NB `np.std` is population sigma, so `stddev_pop`).
Everything compiles to Spark's two-phase hash aggregate (partial map-side
combine, then final after one shuffle on the group keys) — the shape that
scales linearly with input and never materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.queries.registry import query
from multiomix_aws_emr_spark.sources.tables import events_v, load, with_events_v


@query(
    "agg_global",
    oracle=(
        "SELECT COUNT(*) AS n, MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price FROM lineitem"
    ),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate — partial per partition, single final reduce."""
    return load(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_quantity").alias("min_q"),
        F.max("l_quantity").alias("max_q"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@query(
    "agg_groupby",
    oracle=(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "ROUND(AVG(l_discount), 4) AS avg_disc "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped hash aggregate (ref analog R19)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )


@query(
    "agg_distinct",
    oracle=(
        "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust "
        "FROM orders GROUP BY o_orderstatus"
    ),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate — Spark expands to a 2-phase plan automatically."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
    )


@query(
    "agg_stats",
    oracle=with_events_v(
        "SELECT event_type, COUNT(*) AS n, ROUND(AVG(value), 4) AS mean_v, "
        "ROUND(STDDEV_SAMP(value), 4) AS sd_samp, "
        "ROUND(STDDEV_POP(value), 4) AS sd_pop, "
        "ROUND(VAR_SAMP(value), 4) AS var_samp "
        "FROM events_v GROUP BY event_type"
    ),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (ref: np.mean/np.std idle-time metrics,
    metaheuristics.py:707-714, R20 — np.std == stddev_pop)."""
    return (
        events_v(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("mean_v"),
            F.round(F.stddev_samp("value"), 4).alias("sd_samp"),
            F.round(F.stddev_pop("value"), 4).alias("sd_pop"),
            F.round(F.var_samp("value"), 4).alias("var_samp"),
        )
    )


@query(
    "agg_null_counts",
    oracle=(
        "SELECT COUNT(*) - COUNT(o_custkey) AS nulls_custkey, "
        "COUNT(*) - COUNT(o_totalprice) AS nulls_totalprice, "
        "COUNT(*) - COUNT(o_orderdate) AS nulls_orderdate FROM orders"
    ),
)
def agg_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null counts (ref: dropna(axis='columns') data-driven column
    pruning, utils.py:33, R3 — this is its first pass)."""
    o = load(spark, sf_dir, "orders")
    n_all = F.count(F.lit(1))
    return o.agg(
        (n_all - F.count("o_custkey")).alias("nulls_custkey"),
        (n_all - F.count("o_totalprice")).alias("nulls_totalprice"),
        (n_all - F.count("o_orderdate")).alias("nulls_orderdate"),
    )


@query(
    "agg_rollup",
    oracle=(
        "SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n, "
        "CAST(GROUPING(o_orderpriority) + 2*GROUPING(o_orderstatus) AS INTEGER) AS gid "
        "FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"
    ),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (F.grouping("o_orderpriority") + 2 * F.grouping("o_orderstatus"))
        .cast("int")
        .alias("gid"),
    )


@query(
    "agg_cube",
    oracle=(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        "CAST(GROUPING(l_returnflag) + 2*GROUPING(l_linestatus) AS INTEGER) AS gid "
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
    ),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus"))
        .cast("int")
        .alias("gid"),
    )


@query(
    "agg_grouping_sets",
    oracle=(
        "SELECT c_mktsegment, c_nationkey, COUNT(*) AS n, "
        "CAST(GROUPING(c_mktsegment) + 2*GROUPING(c_nationkey) AS INTEGER) AS gid "
        "FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())"
    ),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (the idiomatic Spark API
    for this shape)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_gs")
    return spark.sql(
        "SELECT c_mktsegment, c_nationkey, COUNT(*) AS n, "
        "CAST(GROUPING(c_mktsegment) + 2*GROUPING(c_nationkey) AS INT) AS gid "
        "FROM customer_gs GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())"
    )


@query(
    "agg_approx_distinct",
    oracle=(
        "SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact, "
        "CAST(TRUE AS BOOLEAN) AS within_tol FROM lineitem"
    ),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct count — the sketch that replaces exact
    COUNT(DISTINCT) at 100 TB (one pass, mergeable, no expand).

    Oracle-checked via exact+tolerance: the exact distinct count hashes
    cross-engine, and ``within_tol`` asserts the sketch estimate landed
    within 5x its configured rsd (0.02) of exact — a broken sketch now
    breaks the hash instead of slipping through a rows-only check. The
    exact aggregate exists only as the verification twin; production
    plans ship the sketch alone."""
    sk = load(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("est"),
        F.countDistinct("l_partkey").alias("n_parts_exact"),
    )
    err = F.abs(F.col("est") - F.col("n_parts_exact")) / F.col("n_parts_exact")
    return sk.select("n_parts_exact", (err <= 0.1).alias("within_tol"))


_APPROX_Q_ORACLE = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_exact,
       ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99_exact,
       CAST(TRUE AS BOOLEAN) AS ok50,
       CAST(TRUE AS BOOLEAN) AS ok90,
       CAST(TRUE AS BOOLEAN) AS ok99
FROM orders GROUP BY o_orderstatus
"""


@query("agg_approx_quantiles", oracle=_APPROX_Q_ORACLE)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna quantile sketch (approx_percentile) of order
    totals per status — the mergeable one-pass replacement for exact
    percentiles at 100 TB (no global sort, no full materialization).

    Oracle-checked via exact+tolerance: exact percentiles hash
    cross-engine (Spark ``percentile`` == DuckDB ``quantile_cont``, the
    agg_percentiles parity), and each okXX asserts the sketch value lies
    inside the exact [p-0.01, p+0.01] rank bracket — 10x the documented
    GK rank guarantee (1/accuracy), because at small n the interpolated
    exact bracket edge can cross the nearest data element within a
    sub-rank margin. The exact aggregate is the verification twin;
    production ships the sketch."""
    q = F.expr(
        "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 1000)"
    ).alias("p")
    ex = F.expr(
        "percentile(o_totalprice, array(0.5, 0.9, 0.99, "
        "0.49, 0.51, 0.89, 0.91, 0.98, 1.0))"
    ).alias("b")
    agg = load(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(q, ex)

    def ok(i: int, lo: int, hi: int):
        return F.element_at("p", i).between(
            F.element_at("b", lo), F.element_at("b", hi)
        )

    return agg.select(
        "o_orderstatus",
        F.round(F.element_at("b", 1), 4).alias("p50_exact"),
        F.round(F.element_at("b", 2), 4).alias("p90_exact"),
        F.round(F.element_at("b", 3), 4).alias("p99_exact"),
        ok(1, 4, 5).alias("ok50"),
        ok(2, 6, 7).alias("ok90"),
        ok(3, 8, 9).alias("ok99"),
    )


@query(
    "agg_percentiles",
    oracle=(
        "SELECT o_orderstatus, "
        "ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25, "
        "ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50, "
        "ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75 "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (``percentile``,
    same interpolation rule as DuckDB ``quantile_cont``). The exact twin of
    ``agg_approx_quantiles``: use this when the group cardinality is small
    enough to sort within the aggregate buffer; the sketch form when it
    isn't. One shuffle on the group key either way."""
    p = F.expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))").alias("p")
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(p)
        .select(
            "o_orderstatus",
            F.round(F.element_at("p", 1), 4).alias("p25"),
            F.round(F.element_at("p", 2), 4).alias("p50"),
            F.round(F.element_at("p", 3), 4).alias("p75"),
        )
        .orderBy("o_orderstatus")
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_wide",
    oracle=with_events_v(
        "SELECT user_id, "
        + ", ".join(
            f"ROUND(COALESCE(SUM(value) FILTER (WHERE event_type='{t}'), 0), 2) AS {t}"
            for t in _EVENT_TYPES
        )
        + " FROM events_v GROUP BY user_id"
    ),
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long -> wide pivot (the D1 transpose machinery: ref utils.py:53
    transposes the molecules matrix on load, R1). Explicit value list so the
    plan is a single pass — no extra distinct-values job."""
    ev = events_v(spark, sf_dir)
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum("value"))
        .na.fill(0.0, subset=_EVENT_TYPES)
    )
    return wide.select(
        "user_id", *[F.round(F.col(t), 2).alias(t) for t in _EVENT_TYPES]
    )


_HEAVY_HITTERS_ORACLE = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents
), tot AS (SELECT COUNT(*) AS n FROM tok)
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(COUNT(*) / (SELECT CAST(n AS DOUBLE) FROM tot), 6) AS support
FROM tok GROUP BY word
HAVING COUNT(*) > (SELECT n FROM tot) * 0.005
"""


@query("agg_heavy_hitters", oracle=_HEAVY_HITTERS_ORACLE)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-item mining: every token whose corpus frequency
    exceeds 0.5% support, with the support ratio.

    Scale shape: token counts are a two-phase hash aggregate with
    map-side combine (the word-count shuffle carries one row per distinct
    word per partition, not per token); the corpus-total scalar joins
    back as a broadcast, so the threshold filter is map-side and nothing
    ever sorts or materializes globally. The approximate counterpart at
    extreme cardinality is a count-min sketch / space-saving pass — here
    cardinality is words, so exact is the right default even at 100 TB.
    """
    from multiomix_aws_emr_spark.sources.tables import scan_parallel

    d = scan_parallel(load(spark, sf_dir, "documents"))
    tok = d.select(
        F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    counts = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("_n") * 0.005)
        .select(
            "word",
            "cnt",
            F.round(F.col("cnt") / F.col("_n").cast("double"), 6).alias("support"),
        )
    )


_KLL_ORACLE = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(TRUE AS BOOLEAN) AS ok50, CAST(TRUE AS BOOLEAN) AS ok95
FROM lineitem GROUP BY l_returnflag
"""


@query("agg_kll_quantiles", oracle=_KLL_ORACLE)
def agg_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketch (Karnin-Lang-Liberty, DataSketches) of the
    extended price per return flag: one-pass, mergeable, bounded-memory —
    the 100 TB quantile path where even GK's per-group state is too big.

    Oracle-checked via exact+tolerance: ``n`` is the stream length the
    sketch itself tracked (hashed against the oracle's COUNT(*) — a
    dropped or double-merged batch breaks the hash), and ok50/ok95 assert
    the sketch quantiles sit inside the exact +-0.10 rank bracket. KLL
    compaction is RANDOMIZED (unlike GK/HLL), so the margin is sized for
    zero flake probability — k=200's normalized rank error is ~1.65% at
    99% confidence and subgaussian beyond it, so 6x that margin cannot
    trip honestly while a broken sketch (garbage values) still lands far
    outside."""
    li = load(spark, sf_dir, "lineitem")
    sk = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("_sk"),
        F.expr(
            "percentile(l_extendedprice, array(0.40, 0.60, 0.85, 1.0))"
        ).alias("b"),
    )
    q = lambda p: F.kll_sketch_get_quantile_double(F.col("_sk"), F.lit(p))
    return sk.select(
        "l_returnflag",
        F.kll_sketch_get_n_double("_sk").alias("n"),
        q(0.5).between(F.element_at("b", 1), F.element_at("b", 2)).alias("ok50"),
        q(0.95).between(F.element_at("b", 3), F.element_at("b", 4)).alias("ok95"),
    )


_HLL_REAGG_ORACLE = """
SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs_exact,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_groups,
       CAST(TRUE AS BOOLEAN) AS within_tol
FROM orders
"""


@query("agg_hll_reaggregate", oracle=_HLL_REAGG_ORACLE)
def agg_hll_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch re-aggregation: per-status HLL sketches of the
    distinct customer set, then a sketch UNION across groups for the
    global distinct — the pattern that lets a 100 TB pipeline keep
    per-shard sketches and combine them without touching raw data twice
    (hll_sketch_agg -> hll_union_agg -> hll_sketch_estimate).

    Oracle-checked via exact+tolerance: exact global distinct and group
    count hash cross-engine; ``within_tol`` asserts the UNIONED estimate
    is within 10% of exact (lgConfigK=12 rsd ~1.6%; wide margin covers
    the union), so a merge bug surfaces as a hash break."""
    o = load(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("_sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("est"),
        # count NON-NULL group keys: the oracle's COUNT(DISTINCT) ignores
        # NULLs, and a fixture regeneration could introduce a NULL status
        F.count("o_orderstatus").alias("n_groups"),
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("n_custs_exact"))
    err = F.abs(F.col("est") - F.col("n_custs_exact")) / F.col("n_custs_exact")
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_custs_exact", "n_groups", (err <= 0.1).alias("within_tol")
    )


_PROFILE_ORACLE = """
SELECT 'o_orderkey' AS col_name,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
       CAST(MAX(o_orderkey) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
       NULL, NULL, MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
       ROUND(MIN(o_totalprice), 2), ROUND(MAX(o_totalprice), 2),
       NULL, NULL FROM orders
"""


@query("profile_columns", oracle=_PROFILE_ORACLE)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (the data-quality prelude every corpus
    ingest runs): per-column non-null count, exact distinct, min/max —
    computed in a SINGLE aggregate over one scan, then unpivoted to one
    row per column with ``stack``. The multi-column exact distincts plan
    as one Expand (x3) + hash aggregate — still one scan; at extreme
    cardinality swap ``countDistinct`` for ``approx_count_distinct`` and
    the Expand disappears. The reference's analog is the pandas
    ``clean_dataset`` null scan (utils.py:33-35, R3)."""
    o = load(spark, sf_dir, "orders")
    agg = o.agg(
        F.count("o_orderkey").alias("cnt_k"),
        F.countDistinct("o_orderkey").alias("nd_k"),
        F.min("o_orderkey").cast("double").alias("min_k"),
        F.max("o_orderkey").cast("double").alias("max_k"),
        F.count("o_orderstatus").alias("cnt_s"),
        F.countDistinct("o_orderstatus").alias("nd_s"),
        F.min("o_orderstatus").alias("min_s"),
        F.max("o_orderstatus").alias("max_s"),
        F.count("o_totalprice").alias("cnt_p"),
        F.countDistinct("o_totalprice").alias("nd_p"),
        F.round(F.min("o_totalprice"), 2).alias("min_p"),
        F.round(F.max("o_totalprice"), 2).alias("max_p"),
    )
    return agg.select(
        F.expr(
            "stack(3, "
            "'o_orderkey', cnt_k, nd_k, min_k, max_k, "
            "CAST(NULL AS STRING), CAST(NULL AS STRING), "
            "'o_orderstatus', cnt_s, nd_s, "
            "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min_s, max_s, "
            "'o_totalprice', cnt_p, nd_p, min_p, max_p, "
            "CAST(NULL AS STRING), CAST(NULL AS STRING)"
            ") AS (col_name, n_nonnull, n_distinct, min_num, max_num, "
            "min_str, max_str)"
        )
    )


_WINSOR_ORACLE = """
WITH b AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.01) AS p01,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_kept,
       ROUND(AVG(l.l_extendedprice), 2) AS avg_price_kept
FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
WHERE l.l_extendedprice BETWEEN b.p01 AND b.p99
GROUP BY l.l_returnflag
"""


@query("agg_winsorize_filter", oracle=_WINSOR_ORACLE)
def agg_winsorize_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-based outlier filtering (winsorize-style trim): keep
    rows inside the per-group [p1, p99] band, then re-aggregate — the
    data-cleaning two-pass every quality pipeline runs. The per-group
    bounds table is tiny (one row per group) and BROADCASTS back onto the
    fact scan, so pass 2 is a map-side filter: two scans, zero extra
    shuffles of the fact table. Exact percentiles here (sort-based,
    per-group); at extreme group cardinality swap approx_percentile —
    same plan shape."""
    li = load(spark, sf_dir, "lineitem")
    # one percentile aggregate with an array of fractions (r15): the
    # two-expression form buffered every group's values TWICE (Percentile
    # is a buffering TypedImperativeAggregate); the array form sorts one
    # buffer and reads both fractions from it — same exact values.
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.01, 0.99))").alias("p")
    ).select(
        "l_returnflag",
        F.col("p")[0].alias("p01"),
        F.col("p")[1].alias("p99"),
    )
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .filter(F.col("l_extendedprice").between(F.col("p01"), F.col("p99")))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price_kept"),
        )
    )


_TIME_ROLLUP_ORACLE = (
    "WITH events_v AS (SELECT epoch_ms(ts) AS ts_ms, event_type, value "
    "FROM events) "
    "SELECT (ts_ms // 86400000) * 86400000 AS day_ms, "
    "CASE WHEN GROUPING(hr) = 0 THEN hr ELSE NULL END AS hour_ms, "
    "event_type, CAST(COUNT(*) AS BIGINT) AS n, "
    "ROUND(SUM(value), 2) AS sum_value "
    "FROM (SELECT ts_ms, (ts_ms // 3600000) * 3600000 AS hr, event_type, "
    "value FROM events_v) "
    "GROUP BY GROUPING SETS ((day_ms, hr, event_type), (day_ms, event_type))"
)


@query("agg_time_rollup_multi", oracle=_TIME_ROLLUP_ORACLE)
def agg_time_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hourly AND daily
    per-type event aggregates in ONE pass via GROUPING SETS — the Expand
    operator emits both granularities into a single shuffle instead of
    two scans/jobs (the timeseries-store pattern for maintaining
    multi-resolution rollups). day_ms repeats on the hourly rows, so the
    daily tier is a free re-aggregation of the same stream."""
    ev = events_v(spark, sf_dir)
    day = (F.col("ts_ms") / 86400000).cast("long") * 86400000
    hr = (F.col("ts_ms") / 3600000).cast("long") * 3600000
    base = ev.select(
        day.alias("day_ms"), hr.alias("hr"), "event_type", "value"
    )
    base.createOrReplaceTempView("_time_rollup_base")
    return spark.sql(
        "SELECT day_ms, "
        "CASE WHEN GROUPING(hr) = 0 THEN hr ELSE NULL END AS hour_ms, "
        "event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(SUM(value), 2) AS sum_value "
        "FROM _time_rollup_base "
        "GROUP BY GROUPING SETS ((day_ms, hr, event_type), (day_ms, event_type))"
    )


_HISTOGRAM_ORACLE = """
WITH b AS (
  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi FROM lineitem
)
SELECT CAST(LEAST(FLOOR((l_extendedprice - b.lo) * 10.0 / (b.hi - b.lo)), 9)
            AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(l_extendedprice), 2) AS bucket_min,
       ROUND(MAX(l_extendedprice), 2) AS bucket_max
FROM lineitem, b GROUP BY 1
"""


@query("agg_histogram_equiwidth", oracle=_HISTOGRAM_ORACLE)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10 buckets over the global [min, max]): the
    profiling primitive behind range-partition planning and data-quality
    dashboards. Same two-pass broadcast shape as the winsorize filter —
    the 1-row bounds aggregate joins back as a broadcast, bucketing is a
    map-side expression, and one hash aggregate on a 10-value key
    finishes it. IEEE double division + floor agree across engines, so
    bucket boundaries are exact."""
    li = load(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("l_extendedprice") - F.col("lo"))
            * 10.0
            / (F.col("hi") - F.col("lo"))
        ),
        F.lit(9),
    ).cast("int")
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "l_extendedprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("bucket_min"),
            F.round(F.max("l_extendedprice"), 2).alias("bucket_max"),
        )
    )


_COLLECT_SORTED_ORACLE = """
SELECT lang,
       array_to_string(
         (list(CAST(doc_id AS VARCHAR) ORDER BY doc_id))[1:3], ','
       ) AS first_docs,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang
"""


@query("agg_collect_sorted", oracle=_COLLECT_SORTED_ORACLE)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List-building aggregate with deterministic order AND bounded state:
    the 3 smallest doc_ids per language, serialized as a CSV string.

    Two scale rules demonstrated at once. (1) ``collect_list`` order is
    partition-dependent and its state is unbounded, so the list is fed
    only rows a per-group ``row_number`` pre-pass ranked into the top 3
    — the aggregate buffer holds at most k elements per group no matter
    the corpus size. (2) Array-typed result columns are not portably
    hashable across engines (and crash pandas canonicalizers), so the
    contract output is a scalar ``concat_ws`` string, with the DuckDB
    oracle emitting the identical ``array_to_string`` encoding.
    """
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    ranked = d.select(
        "lang", "doc_id", F.row_number().over(w).alias("rn")
    )
    top3 = F.sort_array(
        F.collect_list(F.when(F.col("rn") <= 3, F.col("doc_id")))
    )
    return ranked.groupBy("lang").agg(
        F.concat_ws(",", F.transform(top3, lambda x: x.cast("string"))).alias(
            "first_docs"
        ),
        F.count(F.lit(1)).alias("n_docs"),
    )


_TTEST_ORACLE = (
    "WITH events_v AS (SELECT user_id, event_type, value FROM events), "
    "g AS (SELECT CAST(user_id % 2 AS INTEGER) AS grp, "
    "CAST(COUNT(*) AS BIGINT) AS n, AVG(value) AS mean_v, "
    "VAR_SAMP(value) AS var_v "
    "FROM events_v WHERE event_type = 'click' GROUP BY 1), "
    "w AS (SELECT MAX(CASE WHEN grp = 0 THEN n END) AS n0, "
    "MAX(CASE WHEN grp = 0 THEN mean_v END) AS m0, "
    "MAX(CASE WHEN grp = 0 THEN var_v END) AS v0, "
    "MAX(CASE WHEN grp = 1 THEN n END) AS n1, "
    "MAX(CASE WHEN grp = 1 THEN mean_v END) AS m1, "
    "MAX(CASE WHEN grp = 1 THEN var_v END) AS v1 FROM g) "
    "SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1, "
    "ROUND(m0 - m1, 4) AS mean_diff, "
    "ROUND((m0 - m1) / SQRT(v0 / n0 + v1 / n1), 4) AS t_stat, "
    "ROUND(POWER(v0 / n0 + v1 / n1, 2) / "
    "(POWER(v0 / n0, 2) / (n0 - 1) + POWER(v1 / n1, 2) / (n1 - 1)), 1) "
    "AS welch_df FROM w"
)


@query("stats_ttest_welch", oracle=_TTEST_ORACLE)
def stats_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test (A/B comparison of click values between
    user-parity cohorts): per-group mean/variance from ONE grouped pass,
    pivoted to a single row, then the t statistic and Welch-Satterthwaite
    degrees of freedom as closed-form column math — experiment analysis
    entirely in the engine, no statistics library, same formula text in
    the oracle."""
    ev = events_v(spark, sf_dir)
    g = (
        ev.filter(F.col("event_type") == "click")
        .groupBy((F.col("user_id") % 2).cast("int").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mean_v"),
            F.var_samp("value").alias("var_v"),
        )
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("mean_v"))).alias("m0"),
        F.max(F.when(F.col("grp") == 0, F.col("var_v"))).alias("v0"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("mean_v"))).alias("m1"),
        F.max(F.when(F.col("grp") == 1, F.col("var_v"))).alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    t = (F.col("m0") - F.col("m1")) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
        + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
    )
    return w.select(
        "n0",
        "n1",
        F.round(F.col("m0") - F.col("m1"), 4).alias("mean_diff"),
        F.round(t, 4).alias("t_stat"),
        F.round(df, 1).alias("welch_df"),
    )


_REGR_ORACLE = (
    "SELECT l_returnflag, "
    "ROUND(corr(l_quantity, l_extendedprice), 5) AS price_qty_corr, "
    "ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope, "
    "ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept, "
    "ROUND(regr_r2(l_extendedprice, l_quantity), 5) AS r2 "
    "FROM lineitem GROUP BY l_returnflag"
)


@query("stats_linear_regression", oracle=_REGR_ORACLE)
def stats_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS in one aggregate pass: corr / regr_slope /
    regr_intercept / regr_r2 are single-pass moment aggregates (sums of
    x, y, xy, x^2, y^2) with map-side partial combine — closed-form
    regression at any scale with zero iteration, the degenerate-but-
    ubiquitous case of the reference's model-fitting loop. Identical
    built-ins exist in DuckDB, so coefficients match to rounding."""
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(x, y), 5).alias("price_qty_corr"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 5).alias("r2"),
    )


_EXPECTATIONS_ORACLE = """
WITH o AS (
  SELECT CAST(COUNT(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS v_null,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_uniq,
         CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT) AS v_pos,
         CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
              AS BIGINT) AS v_dom
  FROM orders
), ri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_ri FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders x
                    WHERE x.o_orderkey = l.l_orderkey)
)
SELECT rule, n_violations, n_violations = 0 AS passed FROM (
  SELECT 'o_orderkey_not_null' AS rule, v_null AS n_violations FROM o
  UNION ALL SELECT 'o_orderkey_unique', v_uniq FROM o
  UNION ALL SELECT 'o_totalprice_positive', v_pos FROM o
  UNION ALL SELECT 'o_orderstatus_domain', v_dom FROM o
  UNION ALL SELECT 'lineitem_orders_ri', v_ri FROM ri
)
"""


@query("quality_expectations", oracle=_EXPECTATIONS_ORACLE)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite (the Deequ/dbt-test
    shape): completeness, uniqueness, range, domain, and referential
    integrity evaluated as ONE aggregate pass over the fact table plus
    one anti-join for the RI rule — violations come back as a tidy
    (rule, n_violations, passed) report. Every single-table rule is a
    conditional aggregate sharing the same scan (map-side combinable);
    only the cross-table rule costs a join. At 100 TB this is the shape
    that works: rule count doesn't multiply scans."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    one = o.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "v_null"
        ),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v_uniq"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "v_pos"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("v_dom"),
    )
    single = one.selectExpr(
        "stack(4, "
        "'o_orderkey_not_null', v_null, "
        "'o_orderkey_unique', v_uniq, "
        "'o_totalprice_positive', v_pos, "
        "'o_orderstatus_domain', v_dom) AS (rule, n_violations)"
    )
    ri = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("lineitem_orders_ri").alias("rule"), "n_violations")
    )
    return single.unionAll(ri).select(
        "rule",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


@query(
    "agg_mode_per_group",
    oracle=with_events_v(
        "SELECT user_id, event_type AS modal_type, "
        "CAST(cnt AS BIGINT) AS n_modal FROM ("
        "  SELECT user_id, event_type, cnt, ROW_NUMBER() OVER ("
        "    PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn "
        "  FROM (SELECT user_id, event_type, COUNT(*) AS cnt "
        "        FROM events_v GROUP BY user_id, event_type)"
        ") WHERE rn = 1"
    ),
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mode (most frequent value, ties broken alphabetically):
    two stacked hash aggregates — count per (group, value), then argmax
    per group via max_by on a (count, reversed-value) sort key. No
    window, no sort: both layers are map-side combinable, which is what
    makes mode affordable at billions of groups (the window-rank
    formulation pays a per-group sort instead). DuckDB mirrors with
    arg_min over (-cnt, value)."""
    ev = events_v(spark, sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # min_by needs ONE orderable key: struct(-cnt, type) compares
    # lexicographically, so the smallest struct is the highest count with
    # the alphabetically first type. The oracle uses the window-rank
    # formulation instead (DuckDB 1.0 arg_min takes no struct key) — it
    # need not scale; this side must.
    return counts.groupBy("user_id").agg(
        F.expr(
            "min_by(event_type, struct(-cnt, event_type))"
        ).alias("modal_type"),
        F.max("cnt").cast("bigint").alias("n_modal"),
    )
