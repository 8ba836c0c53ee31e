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
  (see BASELINE.md round-9 record). Nuance measured in round 10:
  localCheckpoint blocks are cached RDD blocks, so GRACEFUL
  decommission (``spark.storage.decommission.rddBlocks.enabled`` +
  SIGPWR on the preemption notice) migrates them to surviving peers —
  the same fixpoint completed checksum-identical at 1.11x overhead.
  Fast mode + decommission covers noticed preemptions; reliable mode
  remains the only cover for notice-less deaths.
- ``checkpoint()``: blocks are written to the SparkContext checkpoint
  directory (HDFS/S3 on a real fleet), so executor loss recovers by
  re-reading — the posture for long fixpoints on preemptible nodes,
  at the cost of one durable write per round.

``truncate_lineage`` selects per call; ``reliable=None`` defers to the
``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` environment switch so a fleet
deployment can flip every fixpoint in the engine without code changes.

Checkpoint-dir provisioning is master-aware: a driver-local temp dir is
only a valid reliable store when every executor shares the driver's
filesystem — i.e. ``local[*]`` / ``local-cluster`` masters. On any other
master (yarn/k8s/standalone — the preemptible fleets this mode exists
for) a node-local path CANNOT serve recovery reads from surviving
executors, so ``_ensure_checkpoint_dir`` raises instead of silently
degrading; call ``sc.setCheckpointDir`` with a durable shared URI
(HDFS/S3) first.

File lifecycle: durable checkpoint files outlive the DataFrames that
wrote them unless ``spark.cleaner.referenceTracking.cleanCheckpoints``
is true, in which case the ContextCleaner deletes a round's files once
its checkpointed RDD is garbage-collected — exactly the bounded-dir
behavior a many-round fixpoint needs. The conf is STATIC (read when the
ContextCleaner is built with the SparkContext), so ``session.
assemble_conf`` sets it at build time; sessions built elsewhere get a
loud warning from ``_ensure_checkpoint_dir``. Boundedness is asserted by
``tests/test_checkpointing.py::test_reliable_dir_bounded_across_rounds``.
"""

from __future__ import annotations

import os
import tempfile
import warnings

from pyspark.sql import DataFrame

#: Static conf that makes the ContextCleaner delete checkpoint files when
#: their RDD is GC'd (see module docstring); session.assemble_conf sets it.
CLEAN_CHECKPOINTS_CONF = "spark.cleaner.referenceTracking.cleanCheckpoints"


def reliable_default() -> bool:
    """The env-driven default for ``truncate_lineage(reliable=None)``."""
    return os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINT", "") == "1"


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        # A driver-local temp dir is shared-by-construction only under
        # local/local-cluster masters (single host). Anywhere else it
        # would silently break the exact recovery this mode promises.
        from multiomix_aws_emr_spark.session import is_local_master

        if not is_local_master(sc.master):
            raise RuntimeError(
                "reliable checkpointing on a non-local master requires a "
                "durable shared checkpoint dir: call "
                "sc.setCheckpointDir('hdfs://...' or 's3a://...') before "
                "truncate_lineage(reliable=True) "
                f"(master={sc.master!r})"
            )
        sc.setCheckpointDir(tempfile.mkdtemp(prefix="spark_ckpt_"))
    if sc.getConf().get(CLEAN_CHECKPOINTS_CONF, "false") != "true":
        warnings.warn(
            f"{CLEAN_CHECKPOINTS_CONF} is not enabled on this session: "
            "durable checkpoint files will accumulate one per fixpoint "
            "round. Build sessions via session.build_session (which sets "
            "it) or add it to the SparkContext conf.",
            RuntimeWarning,
            stacklevel=3,
        )


def truncate_lineage(
    df: DataFrame, reliable: bool | None = None, *, eager: bool = True
) -> DataFrame:
    """Cut ``df``'s lineage: localCheckpoint (fast) or checkpoint
    (executor-loss-survivable). See module docstring for the measured
    trade-off.

    ``eager=False`` defers materialization to the first action that
    consumes the returned frame — same truncation, no dedicated
    materialization job. Use it when the caller's next step is itself an
    action over the frame (a fixpoint's convergence probe, a count), so
    one job both materializes the checkpoint and computes the probe
    (r15: halved the per-round job count of the CC fixpoint). The first
    consuming action must touch every partition (aggregates do; a bare
    ``limit`` does not) or unmaterialized partitions keep their lineage
    until something computes them."""
    if reliable is None:
        reliable = reliable_default()
    if reliable:
        _ensure_checkpoint_dir(df)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
