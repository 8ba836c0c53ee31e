"""Lineage truncation for iterative fixpoints — fast vs fault-tolerant.

Iterative DataFrame algorithms (min-label propagation, any loop that
feeds a result back into the next round's plan) must cut lineage every
round or the plan doubles per iteration. Spark offers two cuts with
opposite trade-offs, and the difference only shows up when an executor
dies:

- ``localCheckpoint()`` (the default here): blocks live in executor
  local storage, no distributed write, fastest — but the truncated
  lineage means Spark CANNOT recompute a block lost with its executor.
  Measured under the executor-kill probe: one SIGKILLed executor JVM
  mid-fixpoint fails the whole job with a lost-checkpoint-block error
  (see BASELINE.md round-9 record).
- ``checkpoint()``: blocks are written to the SparkContext checkpoint
  directory (HDFS/S3 on a real fleet), so executor loss recovers by
  re-reading — the posture for long fixpoints on preemptible nodes,
  at the cost of one durable write per round.

``truncate_lineage`` selects per call; ``reliable=None`` defers to the
``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` environment switch so a fleet
deployment can flip every fixpoint in the engine without code changes.
In reliable mode a checkpoint dir is provisioned automatically when the
context has none (a local temp dir — real deployments should call
``sc.setCheckpointDir`` with a durable URI instead). Durable checkpoint
files outlive the DataFrames that wrote them unless
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` is set at
session build; long-lived sessions running many fixpoints should set it
(or sweep the checkpoint dir) so per-round files don't accumulate.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame


def reliable_default() -> bool:
    """The env-driven default for ``truncate_lineage(reliable=None)``."""
    return os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINT", "") == "1"


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(tempfile.mkdtemp(prefix="spark_ckpt_"))


def truncate_lineage(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    """Cut ``df``'s lineage: localCheckpoint (fast) or checkpoint
    (executor-loss-survivable). See module docstring for the measured
    trade-off."""
    if reliable is None:
        reliable = reliable_default()
    if reliable:
        _ensure_checkpoint_dir(df)
        return df.checkpoint(eager=True)
    return df.localCheckpoint()
