"""Task-retry recomputation: at cluster scale task retries are routine
(preemption, spot loss, OOM-kills), and Spark's model assumes tasks are
deterministic and side-effect-free so a retried task can simply recompute
its partition. The engine's Python surfaces (mapInPandas / applyInPandas
operators) must uphold that contract: inject a first-attempt failure into
an Arrow-batch stage and the job must still produce the byte-identical
answer.

Local mode defaults to ``spark.task.maxFailures=1`` (``local[N]`` fails
the job on the first task failure — retries need the ``local[N,F]``
master form), which is itself worth pinning: it is why none of the OTHER
tests can exercise retries in the shared session, and why this test runs
a subprocess JVM with ``local[4,2]``.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, sys
sys.path.insert(0, "@REPO@")
from pyspark import TaskContext
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4,2]")  # 4 threads, 2 attempts/task
    .appName("retry_test")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from multiomix_aws_emr_spark.session import configure
configure(spark)

docs = spark.read.parquet("@SF_DIR@" + "/documents.parquet").select(
    "doc_id", "text"
).repartition(4)
schema = "doc_id bigint, n_tokens int"

def tokenize(batches, fail_first_attempt):
    ctx = TaskContext.get()
    if (
        fail_first_attempt
        and ctx is not None
        and ctx.partitionId() == 0
        and ctx.attemptNumber() == 0
    ):
        raise RuntimeError("injected first-attempt failure")
    import pandas as pd
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["text"].str.split().str.len().astype("int32"),
            }
        )

def checksum(fail_first_attempt):
    out = docs.mapInPandas(
        lambda it: tokenize(it, fail_first_attempt), schema
    )
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_id", "n_tokens").cast("decimal(38,0)")).alias(
            "h"
        ),
    ).collect()[0]
    return [row["n"], str(row["h"])]

print(json.dumps({"clean": checksum(False), "retried": checksum(True)}))
"""


def test_arrow_stage_retry_recomputes_identically():
    sf_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
    )
    script = _SCRIPT.replace("@REPO@", REPO).replace("@SF_DIR@", sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    # the retried run finished at all => the injected first-attempt failure
    # was retried (local[4,2]); equality => recomputation was exact
    assert payload["clean"] == payload["retried"]
    assert payload["clean"][0] > 0
