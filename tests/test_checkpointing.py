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
