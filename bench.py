#!/usr/bin/env python
"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced with a noop-format write (full computation, no
driver-side collect, no disk) — the closest local analog to a cluster
materialization. Protocol details in BASELINE.md §B.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")

    from multiomix_aws_emr_spark.queries import QUERIES
    from multiomix_aws_emr_spark.session import build_session

    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths and every table's first scan (file
    # listing, footer reads) once before timing, so per-query numbers
    # measure the query, not cold-FS noise on whichever query sorts first.
    try:
        _force(QUERIES["flagship_revenue_by_region"](spark, sf_dir))
    except Exception:
        pass
    from multiomix_aws_emr_spark.sources.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        try:
            load(spark, sf_dir, t).write.mode("overwrite").format("noop").save()
        except Exception:
            pass

    # Warm the Python-UDF worker pool (one worker per core imports
    # pandas/numpy/pyarrow on first use — otherwise the alphabetically
    # first applyInPandas query absorbs the whole spin-up).
    import pandas as _pd

    def _identity(it):
        for pdf in it:
            yield pdf

    spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        _identity, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    # Warm the Structured Streaming runtime once (micro-batch engine,
    # offset/commit logs, state store, streaming codegen): the session's
    # FIRST streaming run is ~2-3.5x its steady state, and without this
    # it lands on whichever streaming query sorts first.
    from multiomix_aws_emr_spark.streaming.util import prewarm_streaming_runtime

    prewarm_streaming_runtime(spark, sf_dir)

    # Warm the Python Data Source API machinery (r15, declared in
    # OPTIMIZATION_r15.md): the first read/write/stream through a
    # spark.dataSource connector initializes per-session plan classes,
    # the dedicated datasource worker modules, and the driver-side
    # source-runner process — 4-7 s of per-APPLICATION engine init that
    # otherwise lands on whichever datasource query sorts first
    # (source_python_datasource), same first-run class as the UDF-pool
    # and streaming warms above. 1-2-row throwaway jobs.
    from multiomix_aws_emr_spark.sources.pydatasource import (
        prewarm_datasource_api,
    )

    prewarm_datasource_api(spark)

    # Failure-isolated: one broken query loses its own number, never the
    # whole artifact (r3 lesson — a single loader bug zeroed the round's
    # only performance signal).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for qid in sorted(QUERIES):
        start = time.perf_counter()
        try:
            _force(QUERIES[qid](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 - record and continue
            errors[qid] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        timings[qid] = round(time.perf_counter() - start, 2)

    total = round(sum(timings.values()), 2)
    # Host-load probe (BASELINE.md §B): a fixed 30M-iteration pure-Python
    # loop — ~1.5 s on a quiet host, 2.5-3.7 s under load. Lets any reader
    # of the record discount noisy-host rounds.
    t0 = time.perf_counter()
    acc = 0
    for i in range(30_000_000):
        acc += i
    load_probe = round(time.perf_counter() - t0, 2)

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    ordered = sorted(timings.values())
    median = round(ordered[len(ordered) // 2], 2) if ordered else 0.0
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:8]
    )
    # The driver captures only a ~2 KB stdout window (rounds 1 and 2 both
    # overflowed it with the full 159-entry per-query map → BENCH
    # parsed:null). The printed line is therefore a <=1 KB summary whose
    # "queries" map holds only the 8 slowest entries (same qid->sec shape
    # as the contract); the complete per-query map lives in
    # bench_result.json alongside this script.
    summary = {
        "metric": "declared_query_suite_wall",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "median_sec": median,
        "load_probe_sec": load_probe,
        "queries": slowest,
        "full_map": "bench_result.json",
    }
    print(json.dumps(summary, separators=(",", ":")))
    full = {
        "metric": "declared_query_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": sf_val,
        "n_queries": len(timings),
        "median_sec": median,
        "load_probe_sec": load_probe,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_result.json"),
            "w",
        ) as fh:
            fh.write(json.dumps(full, separators=(",", ":")) + "\n")
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
