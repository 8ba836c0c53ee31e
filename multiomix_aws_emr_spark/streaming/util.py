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


def prewarm_streaming_runtime(spark: SparkSession, sf_dir: str) -> None:
    """Pay the Structured Streaming engine's first-run cost on a bounded
    stream over the 5-row ``region`` table so it lands here instead of
    in the first measured streaming query.

    The first streaming run of a session is ~2-3.5x its steady-state
    wall (measured at sf0.1: 5.3 s first vs 1.5-1.7 s repeats of the
    SAME shape; first-batch addBatch 1801 ms vs 425-512 ms warm):
    micro-batch engine classes, offset/commit log machinery, the
    HDFS-backed state store, and the streaming codegen paths all
    initialize once per session. This run exercises exactly that set —
    file-stream source, event-time watermark, stateful windowed
    aggregate, state-store commit, memory sink, availableNow
    termination — reusing an existing fixture file (the session's first
    parquet WRITE costs ~10 s of committer/output-path init on its own,
    so the warm deliberately writes nothing). Failures are swallowed:
    a pre-warm must never break the caller.
    """
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    try:
        _, stream, _ = static_and_stream(spark, sf_dir, "region.parquet")
        out = (
            stream.select(
                F.timestamp_millis(F.col("r_regionkey") * 1000).alias("tts")
            )
            .withWatermark("tts", "0 seconds")
            .groupBy(F.window("tts", "1 second"))
            .count()
        )
        with tempfile.TemporaryDirectory() as ckpt, bounded_state_partitions(
            spark, 2
        ):
            q = (
                out.writeStream.format("memory")
                .queryName(f"prewarm_{uuid.uuid4().hex[:8]}")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    except Exception:
        pass


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


def static_and_stream(spark, sf_dir: str, table_file: str):
    """Return ``(static_df, stream_df, n_state_partitions)`` over one
    parquet table under ``sf_dir``, dispatching on the table's physical
    layout.

    A parquet table ships either as a single FILE (``events.parquet`` —
    the fixture layout) or as a DIRECTORY of part files (the layout every
    parquet writer produces, and the only layout on object stores).
    Spark's FileStreamSource requires its path argument to be a directory
    (``'basePath' must be a directory``), so the single-file layout must
    be streamed by globbing the parent with ``pathGlobFilter``; the
    directory layout must be streamed directly, because a glob on the
    parent matches nothing one level down (UNABLE_TO_INFER_SCHEMA). Any
    non-local URI takes the directory branch. Bounded availableNow runs
    split a directory into ~4 micro-batches via maxFilesPerTrigger so
    watermark progression across batches is actually exercised without
    paying per-file micro-batch overhead.

    ``n_state_partitions`` is the replay-volume-appropriate argument for
    :func:`bounded_state_partitions`: ``None`` (the small default) for a
    single-file replay, and the file count (capped at the core count) for
    a directory — a 32-part table replays with 32 state instances, a
    one-part fixture keeps the measured-cheap small count. Stateful wall
    time is state-partition-parallel, so undersizing it turns a big
    replay into a few giant single-threaded state tasks (measured 77.5s
    -> 23.1s on a 10M-row sessionization replay by lifting 8 -> 32).
    """
    import math
    import os

    path = os.path.join(sf_dir, table_file)
    if "://" not in path and not os.path.isdir(path):
        static = spark.read.option("pathGlobFilter", table_file).parquet(sf_dir)
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", table_file)
            .option("maxFilesPerTrigger", "1")
            .parquet(sf_dir)
        )
        return static, stream, None
    static = spark.read.parquet(path)
    try:
        n_files = sum(
            1 for f in os.listdir(path) if f.endswith(".parquet")
        )
    except OSError:
        n_files = 4
    per_trigger = max(1, math.ceil(n_files / 4))
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", str(per_trigger))
        .parquet(path)
    )
    cores = spark.sparkContext.defaultParallelism
    n_state = max(cores // 4, min(n_files, cores))
    return static, stream, n_state
