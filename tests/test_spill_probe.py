"""tools/spill_probe.py shape contracts at toy scale: the spill evidence
in BASELINE.md rests on (a) every config computing the SAME answer — which
in turn rests on the checksum being order-independent — and (b) each shape
actually exercising the operator it claims (hash agg / global sort / SMJ).
Pin both at sf-fixture scale so a probe refactor can't silently break the
parity check it reports.
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.spill_probe import SHAPES, _shape_dfs  # noqa: E402


def _checksum(df):
    return df.select(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("checksum"),
    ).collect()[0]


def test_sort_shape_checksum_is_order_independent(spark, sf_dir):
    exec_df, check_df = _shape_dfs(spark, sf_dir, "sort")
    assert exec_df is not check_df  # sort executes apart from its parity side
    a, b = _checksum(exec_df), _checksum(check_df)
    assert (a["n"], a["checksum"]) == (b["n"], b["checksum"])


def test_sort_shape_plan_contains_global_sort(spark, sf_dir):
    exec_df, _ = _shape_dfs(spark, sf_dir, "sort")
    plan = exec_df._jdf.queryExecution().executedPlan().toString()
    assert "Sort" in plan and "rangepartitioning" in plan, plan


def test_agg_shape_matches_direct_recompute(spark, sf_dir):
    exec_df, check_df = _shape_dfs(spark, sf_dir, "agg")
    assert exec_df is check_df
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expect = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
        .count()
    )
    assert check_df.count() == expect


def test_join_shape_forces_smj_and_conserves_rows(spark, sf_dir):
    exec_df, check_df = _shape_dfs(spark, sf_dir, "join")
    assert exec_df is check_df
    # the worker disables auto-broadcast; assert the same holds here when
    # forced, and that the grouped join conserves the lineitem row count
    with_conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fresh, _ = _shape_dfs(spark, sf_dir, "join")
        plan = fresh._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        rows = fresh.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_conf)
    li_n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r["n"] for r in rows) == li_n  # every lineitem has its order


def test_all_shapes_enumerated(spark, sf_dir):
    for shape in SHAPES:
        exec_df, check_df = _shape_dfs(spark, sf_dir, shape)
        assert exec_df.columns and check_df.columns
