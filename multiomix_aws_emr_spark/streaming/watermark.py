"""Structured Streaming: watermarked tumbling aggregation with late-row drop.

The logical plan is identical to queries/streams.py:stream_tumbling — only
the source (``readStream``) and sink differ, which is the point of
expressing the batch queries with ``F.window`` in the first place.

Execution model notes:
- ``withWatermark('tts', '1 hour')``: state for a window is kept until the
  event-time watermark (max seen ts - 1h) passes its end; later rows for
  finalized windows are DROPPED — the semantics exercised by the two-batch
  test in tests/test_streaming.py.
- append output mode emits a window exactly once, on finalization. The
  trailing (never-finalized) windows of a bounded run are therefore not
  emitted — correct streaming semantics, asserted in tests.
- at scale the state store is per-(window,type) — bounded by watermark
  horizon, not by input size.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.session import configure


def watermarked_tumbling_plan(events_stream: DataFrame) -> DataFrame:
    """1h-watermark + 1h-tumbling count/sum per event_type over a streaming
    events DataFrame (ts as bigint ns, as read with nanosAsLong)."""
    ev = events_stream.select(
        F.expr("ts div 1000000").alias("ts_ms"), "event_type", "value"
    ).withColumn("tts", F.timestamp_millis("ts_ms"))
    return (
        ev.withWatermark("tts", "1 hour")
        .groupBy(F.window("tts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_v"))
        .select(
            F.unix_millis("w.start").alias("window_start_ms"),
            "event_type",
            "n",
            "sum_v",
        )
    )


def run_watermarked_tumbling(
    spark: SparkSession, sf_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """Run the watermarked aggregation over parquet files as a bounded
    stream (availableNow trigger, one file per micro-batch so the watermark
    advances between batches, memory sink) and return the emitted rows."""
    configure(spark)
    static = spark.read.option("pathGlobFilter", glob).parquet(sf_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(sf_dir)
    )
    out = watermarked_tumbling_plan(stream)
    table = f"wm_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Materialize before the temp checkpoint dir disappears.
    result = spark.table(table)
    result.count()
    return result
