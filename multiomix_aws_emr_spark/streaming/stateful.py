"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's driver loop carries per-star state across iterations on the
driver (`scripts/metaheuristics.py:576-715`); the streaming-native analog
is per-key state carried by the state store across micro-batches. This
module implements the canonical shape — per-user running totals that
survive micro-batch boundaries — as an Arrow-batched grouped-map with
explicit ``GroupState``:

- state schema is a compact struct (n bigint, s double): the store holds
  one row per key, independent of input size — the property that lets it
  run unbounded at 100 TB/day ingest;
- each micro-batch updates only the keys present in that batch (update
  output mode), so emitted rows are deltas, not a full re-dump;
- no timeout is set (totals never expire); session-style eviction would
  use ``GroupStateTimeout.EventTimeTimeout`` plus a watermark, as the
  watermark module does for windows.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from multiomix_aws_emr_spark.session import configure
from multiomix_aws_emr_spark.streaming.util import (
    bounded_state_partitions,
    cleanup_stream_checkpoint,
    static_and_stream,
    stream_checkpoint_dir,
)

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, s double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].dropna().sum())
    state.update((n, s))
    # raw sum out; rounding happens JVM-side afterward (SQL ROUND is
    # half-away-from-zero, Python's round is banker's — mixing them
    # breaks cross-engine parity on .xx5 boundaries)
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
    )


def running_totals_plan(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in the state store."""
    ev = events_stream.select("user_id", "value")
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_running_totals(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    *,
    sink_dir: str | None = None,
) -> DataFrame:
    """Drive the stateful operator over parquet files as a bounded stream
    (one file per micro-batch, availableNow). Update mode emits one row
    per (user, batch-with-activity); the FINAL update per user equals the
    batch groupBy total, so the result reduces the sink to it — per-user
    n_events strictly increases across that user's updates, making max_by
    exact. (A single-file replay has one batch and the reduction is a
    no-op; a multi-part directory replay emits intermediate updates —
    caught by the directory-layout parity sweep, round 5.)

    Emitted updates are row-proportional to (users x active batches), so
    big replays need a durable sink — but FILE sinks reject update mode,
    so the scale path (``sink_dir`` / ``SPARK_GRAFT_STREAM_SINK_DIR``) is
    ``foreachBatch`` appending each batch's updates to parquet: duplicate
    keys across batches are exactly what the reduction already handles.
    """
    import os

    configure(spark)
    _, stream, n_state = static_and_stream(spark, sf_dir, glob)
    out = running_totals_plan(stream)
    sink_dir = sink_dir or os.environ.get("SPARK_GRAFT_STREAM_SINK_DIR") or None
    table = f"st_{uuid.uuid4().hex[:8]}"
    from multiomix_aws_emr_spark.streaming.util import await_bounded

    ckpt = stream_checkpoint_dir(spark, "ck_st")
    with bounded_state_partitions(spark, n_state):
        w = (
            out.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        if sink_dir is None:
            q = w.format("memory").queryName(table).start()
        else:
            out_path = os.path.join(sink_dir, table)

            def _append(batch_df: DataFrame, batch_id: int) -> None:
                batch_df.write.mode("append").parquet(out_path)

            q = w.foreachBatch(_append).start()
        await_bounded(q, table)
    # SUCCESS-ONLY sweep (the stream_checkpoint_dir policy): a failed run
    # keeps its checkpoint for diagnosis; the durable root's TTL janitor
    # is the backstop for leftovers.
    cleanup_stream_checkpoint(ckpt, spark)
    from pyspark.sql import functions as F

    if sink_dir is None:
        result = spark.table(table)
        result.count()
    else:
        # Zero batches emitted => foreachBatch never created out_path.
        # Probe by attempting the read and catching exactly PATH_NOT_FOUND
        # (same fix as util.bounded_result, ADVICE r7): an os.path.exists
        # check is always False for hdfs://"/"s3a:// sink dirs and would
        # silently discard committed results on a non-local durable sink.
        from pyspark.errors import AnalysisException

        try:
            result = spark.read.schema(out.schema).parquet(out_path)
            result.schema  # force eager path resolution
        except AnalysisException as exc:
            if (exc.getCondition() or "") != "PATH_NOT_FOUND":
                raise
            result = spark.createDataFrame([], out.schema)
    final = result.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_value"),
    )
    return final.select(
        "user_id", "n_events", F.round("sum_value", 2).alias("sum_value")
    )
