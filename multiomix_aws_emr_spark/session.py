"""SparkSession factory and runtime configuration baseline.

The configuration set carries the operational lessons of the reference
(SURVEY.md §4.2; reference `src/emr.py:105-137`, `Dockerfile:9-17`) plus the
cross-engine determinism requirements of the oracle harness:

- UTC session timezone (timestamp->date casts must agree with DuckDB),
- ``nanosAsLong`` parquet read (the events fixture is TIMESTAMP(NANOS);
  stock Spark 4.x refuses it — verified recipe, SURVEY.md §7.5.1),
- AQE on (runtime re-planning: skew joins, partition coalescing),
- Arrow on (vectorized pandas UDF exchange — the fast path for every
  ``applyInPandas`` / ``mapInPandas`` operator in this engine).

All of these are runtime-settable SQL confs, so :func:`configure` can also
be applied to an externally-created session (the driver harness creates its
own ``SparkSession``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs — applied defensively by every query entry
# point so an externally-built session still reads the fixtures correctly.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply the runtime conf baseline to an existing session (idempotent)."""
    for key, value in RUNTIME_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Conf may be static on some builds; reads will then rely on the
            # session having been built via build_session().
            pass
    return spark


def build_session(
    app_name: str = "multiomix-aws-emr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local session sized for the harness environment.

    Shuffle partition count defaults to the core count: at local[32] with
    sub-GB inputs, 32 partitions keeps every core busy without flooding the
    scheduler with empty tasks. At cluster scale this is superseded by AQE
    coalescing (`spark.sql.adaptive.coalescePartitions.enabled`, on by
    default when AQE is on).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    return configure(builder.getOrCreate())
