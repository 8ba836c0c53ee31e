"""Shared helpers for the bounded streaming runners.

``bounded_state_partitions`` right-sizes ``spark.sql.shuffle.partitions``
for the lifetime of a BOUNDED streaming run. Stateful streaming stages get
no AQE: the partition count chosen at first checkpoint creation is the
state-store instance count forever, and every micro-batch pays a fixed
per-instance cost (store open, version commit, delta file) regardless of
data volume. For a bounded replay of one fixture file, running 32 state
partitions is pure overhead — measured 5.6s -> 2.3s warm on the
stream-stream interval join at sf0.1 by dropping to 8. Production streams
size this deliberately by throughput x key cardinality (it cannot be
changed after the checkpoint exists); these bounded runs size it to the
replayed volume the same way. The previous conf value is restored on exit
so batch queries keep their own sizing.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def bounded_state_partitions(spark: SparkSession, n: int | None = None):
    """Temporarily size shuffle/state partitions for a bounded stream run."""
    if n is None:
        n = max(4, spark.sparkContext.defaultParallelism // 4)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
