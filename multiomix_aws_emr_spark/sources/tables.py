"""Fixture-table loaders and the normalized ``events_v`` view.

The harness tables (TESTDATA.md / FIXTURES.md §A) are one parquet file per
table under an sf directory. Loading is a plain ``spark.read.parquet`` —
column pruning and predicate pushdown then happen for free in the scan
(verify with ``.explain``: ``ReadSchema`` / ``PushedFilters``).

``events.ts`` has shipped in two physical parquet encodings across fixture
generations: TIMESTAMP(NANOS) (arrives as a nanosecond bigint under
``spark.sql.legacy.parquet.nanosAsLong=true``) and TIMESTAMP(MICROS,
isAdjustedToUTC=false) (arrives as TIMESTAMP_NTZ; the nanos conf is then a
no-op). Every query standardizes on ``ts_ms`` epoch milliseconds via
:func:`ts_ms_expr`, which dispatches on the dtype that actually arrived —
both paths truncate exactly like DuckDB's ``epoch_ms(ts)`` (SURVEY.md
§7.5.1; the NTZ→TZ cast is exact because the session timezone is UTC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.session import configure

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# DataFrame handles are lazy plans, so one per (context, sf_dir, table) can
# be shared by every query in a session: re-reading costs a file listing +
# parquet footer/schema fetch per call, which at ~0.1 s × a few tables ×
# 133 queries is pure overhead in the correctness/bench harnesses. Fixture
# tables are immutable, so the cached plan never goes stale; keying on
# applicationId makes a stopped context's entries unreachable, and the
# eviction below drops them on the next access from a new context (so
# stale DataFrames don't pin their stopped SparkSession for the process
# lifetime).
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from an sf directory (plan cached per session)."""
    configure(spark)
    app_id = spark.sparkContext.applicationId
    for k in [k for k in _LOAD_CACHE if k[0] != app_id]:
        del _LOAD_CACHE[k]
    key = (app_id, sf_dir, name)
    df = _LOAD_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _LOAD_CACHE[key] = df
    return df


def scan_parallel(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across every core before per-row-heavy work.

    A single small parquet file with one row group arrives as ONE input
    split, so any explode/hash/Pandas-UDF pipeline downstream runs
    serially no matter how many cores exist. Repartitioning costs a tiny
    shuffle of the base rows and buys full parallelism for the expensive
    part. No-op when the scan is already split at least as wide as the
    cluster (the production case: thousands of input files) — so this is
    safe to leave in the plan at any scale.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def ts_ms_expr(df: DataFrame):
    """Normalize an events frame's ``ts`` to epoch milliseconds (bigint).

    Dispatches on the dtype ``ts`` actually arrived as, so the engine reads
    every fixture generation (and both static and streaming frames):

    - ``bigint``: nanoseconds (TIMESTAMP(NANOS) parquet under the
      ``nanosAsLong`` conf) → ``ts div 1000000``.
    - ``timestamp`` / ``timestamp_ntz``: TIMESTAMP(MICROS) parquet →
      ``unix_millis(cast(ts as timestamp))``. With a UTC session timezone
      the NTZ→TZ cast is exact, and unix_millis' micros→millis floor
      matches DuckDB ``epoch_ms``.
    """
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        return F.expr("ts div 1000000")
    return F.unix_millis(F.col("ts").cast("timestamp"))


def events_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The normalized events view: ``ts`` -> ``ts_ms`` (epoch-ms bigint).

    Mirrors the DuckDB-side view used in every oracle:
    ``SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value,
    props FROM events``.
    """
    df = load(spark, sf_dir, "events")
    return df.select(
        "event_id",
        ts_ms_expr(df).alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


_EVENTS_V_CTE = (
    "events_v AS (SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, "
    "event_type, value, props FROM events)"
)


def with_events_v(sql: str) -> str:
    """Prefix oracle SQL with the ``events_v`` CTE (DuckDB side)."""
    return f"WITH {_EVENTS_V_CTE} {sql}"
