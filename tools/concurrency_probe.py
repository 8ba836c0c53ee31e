"""Concurrency probe: multi-tenant query scheduling measured on one host.

A production deployment serves MANY queries at once from a shared
SparkSession (the reference's control plane queues jobs against one EMR
cluster the same way — see service/jobs.py for the re-founded surface).
Every probe so far measures one query at a time; this one measures the
engine's behavior when a realistic 8-query mix is submitted
simultaneously:

  serial  one query after another (the bench protocol; the makespan
          lower bound is its total)
  fifo    8 threads submit at once; Spark's default FIFO scheduler —
          early-submitted jobs hog all 32 cores, late ones queue
  fair    8 threads submit at once; spark.scheduler.mode=FAIR with one
          pool per query (sc.setLocalProperty) — cores are round-robined
          across running jobs, trading a little makespan for latency
          fairness

`spark.scheduler.mode` is a SparkContext-construction setting, so each
mode runs in a FRESH JVM (same pattern as tools/spill_probe.py). Every
mode reports per-query wall (submit -> finish, including queueing), the
makespan, and an order-independent checksum per query; the parent asserts
checksum parity across ALL modes — concurrent submission must never
change an answer (thread-safety of the shared session is part of the
claim, not an assumption).

The mix spans the suite's tiers: two heavy composites, a TPC-H shape, a
sessionization window, two text shapes, a join and an agg.

Usage:
  python tools/concurrency_probe.py [--src /root/testdata/sf0.1]
                                    [--modes serial,fifo,fair]
                                    [--queries q1,q2,...]

``--queries`` overrides the mix — used with the scale probe's 100x
relational corpus to measure the regime where scheduling policy actually
matters: multi-second jobs, where FIFO head-of-line blocking starves a
light query behind heavy ones and FAIR round-robins cores across pools.

Prints one JSON line per (mode, query) plus per-mode summaries and a
parity line; exits non-zero on checksum divergence or any query error.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the 8-query mix: heavy composites + representative shapes of each tier
QUERY_MIX = (
    "pipeline_curation_v3",
    "dedup_near_minhash",
    "sql_large_volume_customer",
    "window_sessionize",
    "text_unigram_rarity",
    "text_tfidf_topterm",
    "join_multiway",
    "agg_groupby",
)

MODES = ("serial", "fifo", "fair")


def checksum_row(df):
    """Order-independent (count, sum-of-row-hashes) over any scalar-column
    result; decimal accumulator so large sums don't trip ANSI overflow."""
    from pyspark.sql import functions as F

    row = df.select(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("checksum"),
    ).collect()[0]
    return row["n"], str(row["checksum"])


def run_mix(
    spark,
    sf_dir: str,
    concurrent: bool,
    fair_pools: bool,
    queries: tuple = QUERY_MIX,
) -> list[dict]:
    """Run QUERY_MIX once; returns per-query dicts with wall + checksum.

    ``concurrent`` submits every query from its own thread (the session is
    shared — Spark job submission is thread-safe and jobs interleave);
    ``fair_pools`` additionally isolates each thread in its own FAIR pool
    via the thread-local ``spark.scheduler.pool`` property (no-op unless
    the context was built with spark.scheduler.mode=FAIR).
    """
    from multiomix_aws_emr_spark.queries import QUERIES

    results: list[dict] = [None] * len(queries)  # type: ignore[list-item]

    def one(i: int, qid: str) -> None:
        sc = spark.sparkContext
        if fair_pools:
            sc.setLocalProperty("spark.scheduler.pool", qid)
        try:
            t0 = time.perf_counter()
            n, chk = checksum_row(QUERIES[qid](spark, sf_dir))
            results[i] = {
                "query": qid,
                "wall_s": round(time.perf_counter() - t0, 2),
                "rows": n,
                "checksum": chk,
            }
        except Exception as e:  # surfaced by the parent as a failure
            results[i] = {"query": qid, "error": repr(e)[:300]}
        finally:
            if fair_pools:
                sc.setLocalProperty("spark.scheduler.pool", None)

    if concurrent:
        threads = [
            threading.Thread(target=one, args=(i, q), daemon=True)
            for i, q in enumerate(queries)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    else:
        for i, q in enumerate(queries):
            one(i, q)
    return results


def run_worker(
    sf_dir: str, mode: str, queries: tuple = QUERY_MIX, heap: str = "8g"
) -> int:
    from pyspark.sql import SparkSession

    from multiomix_aws_emr_spark.session import RUNTIME_CONF

    builder = (
        SparkSession.builder.appName(f"concurrency_probe_{mode}")
        .master("local[32]")
        .config("spark.driver.memory", heap)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
    )
    if mode == "fair":
        builder = builder.config("spark.scheduler.mode", "FAIR")
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # warm pass (always serial): compile plans and fault in the scan caches
    # so the measured pass compares scheduling, not codegen
    run_mix(spark, sf_dir, concurrent=False, fair_pools=False, queries=queries)

    t0 = time.perf_counter()
    rows = run_mix(
        spark,
        sf_dir,
        concurrent=(mode != "serial"),
        fair_pools=(mode == "fair"),
        queries=queries,
    )
    makespan = round(time.perf_counter() - t0, 2)

    failed = False
    for qid, r in zip(queries, rows):
        r = r or {"query": qid, "error": "no result (worker thread died)"}
        print(json.dumps({"mode": mode, **r}), flush=True)
        failed |= "error" in r
    walls = [r["wall_s"] for r in rows if r and "wall_s" in r]
    print(
        json.dumps(
            {
                "mode": mode,
                "makespan_s": makespan,
                "sum_walls_s": round(sum(walls), 2),
                "max_query_wall_s": max(walls, default=0),
                "min_query_wall_s": min(walls, default=0),
            }
        ),
        flush=True,
    )
    spark.stop()
    return 1 if failed else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--modes", default=",".join(MODES))
    ap.add_argument("--queries", default=",".join(QUERY_MIX))
    ap.add_argument("--heap", default="8g")
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--sf-dir", help=argparse.SUPPRESS)
    ap.add_argument("--mode", help=argparse.SUPPRESS)
    args = ap.parse_args()
    queries = tuple(q for q in args.queries.split(",") if q)

    if args.worker:
        return run_worker(args.sf_dir, args.mode, queries, args.heap)

    checksums: dict[str, dict[str, tuple]] = {}
    failed = False
    for mode in [m for m in args.modes.split(",") if m]:
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--worker",
                "--sf-dir",
                args.src,
                "--mode",
                mode,
                "--queries",
                ",".join(queries),
                "--heap",
                args.heap,
            ],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        got_summary = False
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            print(json.dumps(rec), flush=True)
            if "query" in rec:
                if "error" in rec:
                    failed = True
                else:
                    checksums.setdefault(rec["query"], {})[mode] = (
                        rec["rows"],
                        rec["checksum"],
                    )
            elif "makespan_s" in rec:
                got_summary = True
        if proc.returncode != 0 or not got_summary:
            failed = True
            print(
                json.dumps(
                    {
                        "mode": mode,
                        "error": f"worker rc={proc.returncode}",
                        "stderr_tail": proc.stderr[-800:],
                    }
                ),
                flush=True,
            )

    parity_ok = True
    for qid, by_mode in checksums.items():
        ok = len(set(by_mode.values())) == 1
        parity_ok &= ok
        if not ok:
            print(
                json.dumps({"query": qid, "checksum_parity": False, **{
                    m: list(v) for m, v in by_mode.items()
                }}),
                flush=True,
            )
    print(
        json.dumps(
            {"checksum_parity": parity_ok, "n_queries": len(checksums)}
        ),
        flush=True,
    )
    return 0 if parity_ok and not failed else 1


if __name__ == "__main__":
    sys.exit(main())
