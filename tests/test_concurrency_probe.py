"""tools/concurrency_probe.py contracts at fixture scale: the BASELINE
concurrency evidence rests on (a) concurrent submission computing the
SAME answer as serial (thread-safety of the shared session), and (b) the
checksum being order-independent. Pin both in-process so a probe refactor
can't silently break the parity it reports. The scheduler-mode contrast
itself (FIFO vs FAIR) needs a fresh JVM per mode and stays in the tool."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.concurrency_probe import checksum_row, run_mix  # noqa: E402

_SUBSET = ("sql_large_volume_customer", "window_sessionize", "agg_groupby")


def test_concurrent_matches_serial(spark, sf_dir):
    serial = run_mix(spark, sf_dir, concurrent=False, fair_pools=False,
                     queries=_SUBSET)
    conc = run_mix(spark, sf_dir, concurrent=True, fair_pools=False,
                   queries=_SUBSET)
    assert all("error" not in r for r in serial + conc), (serial, conc)
    assert [(r["query"], r["rows"], r["checksum"]) for r in serial] == [
        (r["query"], r["rows"], r["checksum"]) for r in conc
    ]


def test_fair_pool_property_is_safe_under_fifo_context(spark, sf_dir):
    # setting the pool local property on a FIFO context must be a no-op,
    # not an error — the probe worker relies on this for the warm pass
    rows = run_mix(spark, sf_dir, concurrent=True, fair_pools=True,
                   queries=_SUBSET)
    assert all("error" not in r for r in rows), rows
    # and the thread-local property must not leak into the main thread
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None


def test_checksum_is_order_independent(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_totalprice"
    )
    a = checksum_row(df)
    b = checksum_row(df.orderBy("o_totalprice"))
    assert a == b
