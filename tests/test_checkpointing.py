"""operators/checkpointing.truncate_lineage — both cuts produce the same
data, reliable mode provisions a checkpoint dir, and the env switch
drives the default."""

import pyspark.sql.functions as F

from multiomix_aws_emr_spark.operators.checkpointing import (
    reliable_default,
    truncate_lineage,
)


def test_both_modes_return_same_rows(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    fast = truncate_lineage(df, reliable=False)
    durable = truncate_lineage(df, reliable=True)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, durable.collect())
    )


def test_reliable_mode_provisions_checkpoint_dir(spark):
    df = truncate_lineage(spark.range(10), reliable=True)
    assert df.count() == 10
    assert spark.sparkContext.getCheckpointDir() is not None


def test_env_switch_drives_default(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
    assert reliable_default() is False
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    assert reliable_default() is True
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "0")
    assert reliable_default() is False


class _StubSC:
    """Just enough SparkContext surface for _ensure_checkpoint_dir."""

    def __init__(self, master, ckpt_dir=None, conf=None):
        self.master = master
        self._ckpt = ckpt_dir
        self._conf = conf or {}

    def getCheckpointDir(self):
        return self._ckpt

    def setCheckpointDir(self, d):
        self._ckpt = d

    def getConf(self):
        conf = self._conf

        class _C:
            @staticmethod
            def get(key, default=None):
                return conf.get(key, default)

        return _C()


class _StubDF:
    def __init__(self, sc):
        class _S:
            sparkContext = sc

        self.sparkSession = _S()


def test_non_local_master_without_dir_raises():
    """A driver-local temp dir cannot serve reliable checkpoints on a real
    fleet (executors read node-local paths) — the mode must refuse loudly
    instead of silently staying unrecoverable."""
    import pytest

    from multiomix_aws_emr_spark.operators.checkpointing import (
        _ensure_checkpoint_dir,
    )

    with pytest.raises(RuntimeError, match="setCheckpointDir"):
        _ensure_checkpoint_dir(_StubDF(_StubSC("spark://fleet:7077")))


def test_non_local_master_with_durable_dir_accepted():
    from multiomix_aws_emr_spark.operators.checkpointing import (
        CLEAN_CHECKPOINTS_CONF,
        _ensure_checkpoint_dir,
    )

    sc = _StubSC(
        "k8s://https://fleet:6443",
        ckpt_dir="s3a://bucket/ckpt",
        conf={CLEAN_CHECKPOINTS_CONF: "true"},
    )
    _ensure_checkpoint_dir(_StubDF(sc))  # no raise, no provisioning
    assert sc.getCheckpointDir() == "s3a://bucket/ckpt"


def test_missing_cleanup_conf_warns():
    """Sessions built outside build_session (which sets the static
    cleanCheckpoints conf) must get a loud file-leak warning."""
    import pytest

    from multiomix_aws_emr_spark.operators.checkpointing import (
        _ensure_checkpoint_dir,
    )

    with pytest.warns(RuntimeWarning, match="accumulate"):
        _ensure_checkpoint_dir(_StubDF(_StubSC("local[4]")))


def test_reliable_dir_bounded_across_rounds(spark):
    """Multi-round fixpoint in reliable mode must not accumulate one
    checkpoint dir per round forever: build_session sets
    spark.cleaner.referenceTracking.cleanCheckpoints, so the
    ContextCleaner deletes a round's files once its RDD is GC'd."""
    import gc
    import glob
    import os
    import time

    from multiomix_aws_emr_spark.operators.components import (
        connected_components,
    )

    sc = spark.sparkContext
    assert (
        sc.getConf().get(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
        )
        == "true"
    )
    # A 12-edge chain needs many min-label rounds -> many durable
    # checkpoints (sym + initial labels + one per round).
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["src", "dst"]
    )
    out = connected_components(edges, reliable=True)
    assert out.count() == n + 1
    # getCheckpointDir returns the per-context uuid dir with a scheme
    # prefix (file:/tmp/spark_ckpt_x/<uuid>); rdd-<id> dirs sit under it.
    ckpt = sc.getCheckpointDir().removeprefix("file:")

    def rdd_dirs():
        return set(glob.glob(os.path.join(ckpt, "rdd-*")))

    written = rdd_dirs()
    assert len(written) >= 4, f"fixpoint checkpointed too little: {written}"
    del out
    gc.collect()  # release the py4j refs so the JVM RDDs become garbage
    deadline = time.monotonic() + 90
    remaining = written
    while time.monotonic() < deadline:
        sc._jvm.System.gc()
        remaining = rdd_dirs() & written
        if len(remaining) <= 2:
            break
        time.sleep(1.0)
    assert len(remaining) <= 2, (
        f"checkpoint dir grew unbounded: {len(remaining)}/{len(written)} "
        "round dirs survived GC with cleanCheckpoints=true"
    )


def test_components_accepts_reliable_flag(spark):
    from multiomix_aws_emr_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 9)], ["src", "dst"]
    )
    out = {
        (r.node, r.component)
        for r in connected_components(edges, reliable=True).collect()
    }
    # chain 1-2-3 collapses to component 1; 5-6 to 5; 9 self-loop to 9
    assert out == {(1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (9, 9)}
