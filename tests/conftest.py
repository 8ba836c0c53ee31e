import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
# sf0.001 keeps the full-suite parity run fast; set SPARK_GRAFT_PARITY_SF=sf0.01
# to reproduce the driver's exact correctness gate locally.
PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return f"{TESTDATA}/{PARITY_SF}"


@pytest.fixture(scope="session")
def spark():
    from multiomix_aws_emr_spark.session import build_session

    spark = build_session(
        app_name="tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        src = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(src):
            # directory-layout copies (tools/make_dirlayout.py): DuckDB
            # needs the part-file glob where Spark takes the dir itself
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    yield con
    con.close()
