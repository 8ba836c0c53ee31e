"""Differential test: every oracle-checked declared query, Spark vs DuckDB.

This is a local mirror of the driver's correctness gate
(CORRECTNESS_r{N}.json). Runs at sf0.001 by default for speed; set
SPARK_GRAFT_PARITY_SF=sf0.01 to match the driver exactly.
"""

import pytest

from multiomix_aws_emr_spark.queries import ORACLES, QUERIES

from tests.compare import compare_results


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_oracle_parity(qid, spark, duck, sf_dir):
    sdf = QUERIES[qid](spark, sf_dir)
    rel = duck.sql(ORACLES[qid])
    problems = compare_results(sdf, rel)
    assert not problems, f"{qid}: " + "; ".join(problems)


@pytest.mark.parametrize("qid", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(qid, spark, sf_dir):
    df = QUERIES[qid](spark, sf_dir)
    assert df.count() > 0, f"{qid} produced no rows"
