"""Fixture-drift smoke test: the engine must read ``events.ts`` into an
epoch-millisecond BIGINT for EVERY parquet physical encoding the harness
has ever shipped. Round 3 lost 15 driver queries + the whole bench to a
silent fixture regeneration (TIMESTAMP(NANOS) -> TIMESTAMP(MICROS)); this
test writes both encodings locally so the next regeneration cannot zero a
round again (VERDICT.md r3 item 4).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from multiomix_aws_emr_spark.sources.tables import ts_ms_expr

# One exact row: 2021-06-01T12:34:56.789123 UTC -> epoch ms 1622550896789
_EPOCH_US = 1622550896789123
_WANT_MS = 1622550896789


def _write(tmpdir: str, unit: str) -> str:
    path = os.path.join(tmpdir, f"events_{unit}.parquet")
    factor = {"us": 1, "ns": 1000}[unit]
    arr = pa.array([_EPOCH_US * factor, 0], type=pa.timestamp(unit))
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": arr,
            "user_id": pa.array([7, 8], type=pa.int64()),
        }
    )
    pq.write_table(tbl, path)
    return path


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_ts_normalizes_to_epoch_ms_bigint(spark, tmp_path, unit):
    path = _write(str(tmp_path), unit)
    df = spark.read.parquet(path)
    out = df.select("event_id", ts_ms_expr(df).alias("ts_ms"))
    assert dict(out.dtypes)["ts_ms"] == "bigint"
    rows = {r["event_id"]: r["ts_ms"] for r in out.collect()}
    assert rows == {1: _WANT_MS, 2: 0}


def test_fixture_events_reads_clean(spark, sf_dir):
    """Whatever encoding the CURRENT fixture uses, events_v must produce
    ts_ms bigint and be orderable (the exact op that threw in r3)."""
    from multiomix_aws_emr_spark.sources.tables import events_v

    df = events_v(spark, sf_dir)
    assert dict(df.dtypes)["ts_ms"] == "bigint"
    row = df.orderBy("ts_ms").limit(1).collect()
    assert len(row) == 1 and isinstance(row[0]["ts_ms"], int)
