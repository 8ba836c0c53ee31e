"""CBO / ANALYZE statistics: catalog stats recorded, surfaced in the
optimized plan, and driving selectivity + broadcast decisions — the
estimate machinery the 100 TB join strategy rests on."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from multiomix_aws_emr_spark.plans.stats import (
    analyze_table,
    catalog_row_count,
    plan_stats,
)
from multiomix_aws_emr_spark.sources.tables import load


@pytest.fixture()
def analyzed_nation(spark, sf_dir, tmp_path):
    name = "cbo_nation"
    load(spark, sf_dir, "nation").write.mode("overwrite").option(
        "path", str(tmp_path / "nation_tbl")
    ).saveAsTable(name)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_analyze_records_row_count(spark, analyzed_nation):
    assert catalog_row_count(spark, analyzed_nation) is None
    analyze_table(spark, analyzed_nation, columns=["n_regionkey", "n_name"])
    n = catalog_row_count(spark, analyzed_nation)
    assert n == spark.table(analyzed_nation).count()


def test_cbo_row_count_flows_into_plan_estimates(spark, analyzed_nation):
    analyze_table(spark, analyzed_nation, columns=["n_regionkey", "n_name"])
    prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        full = plan_stats(spark.table(analyzed_nation))
        assert full["row_count"] == spark.table(analyzed_nation).count()
        # column stats make the equality filter's estimate selective:
        # ndv(n_regionkey)=5 -> ~rowCount/5, strictly below the full count
        filtered = plan_stats(
            spark.table(analyzed_nation).filter(F.col("n_regionkey") == 1)
        )
        assert filtered["row_count"] is not None
        assert 0 < filtered["row_count"] < full["row_count"]
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)


def test_stats_based_broadcast_without_hint(spark, sf_dir, analyzed_nation):
    """With accurate ANALYZE sizes the optimizer must pick a broadcast
    join for the tiny analyzed dimension — no broadcast() hint in the
    query."""
    analyze_table(spark, analyzed_nation)
    joined = load(spark, sf_dir, "customer").join(
        spark.table(analyzed_nation),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
