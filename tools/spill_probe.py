"""Spill probe: measure shuffle-partition right-sizing under memory pressure.

SURVEY.md §6 claims the engine's shapes are *spill-aware*: partitions sized
so shuffle-side state (hash-agg maps, sort runs, SMJ buffers) fits executor
memory, with graceful disk spill — not OOM — when it doesn't. Every other
scale claim now has a probe (tools/scale_probe.py, tools/skew_probe.py);
this one measures the memory axis.

Protocol: the 100x key-shifted relational corpus (60M-row lineitem, ~15M
distinct order keys — synthesized by tools/scale_probe.py's relational
tier) is pushed through the three shuffle-state shapes that dominate any
relational/LLM-curation workload:

  agg   groupBy(l_orderkey).sum — hash-agg map per partition (Q18's core)
  sort  global orderBy(l_extendedprice, l_orderkey) — external sort runs
  join  lineitem ⋈ orders on the shifted key, broadcast disabled — SMJ
        with sort buffers on both sides (the skew probe's layout, unskewed)

Each (heap, shuffle.partitions, AQE) config runs in a FRESH JVM (driver
memory is a launch-time setting in local mode) with the Spark UI enabled,
and reports wall time plus memory/disk spill bytes summed from the status
REST API (/api/v1/applications/<id>/stages), plus an order-independent
answer checksum (sum of xxhash64 over result rows) so every config is
proven to compute the SAME answer regardless of how much it spilled.

The matrix contrasts:
  8g x 32 parts, AQE on   — the bench baseline (no pressure)
  2g x  4 parts, AQE on   — pressure + too-coarse: AQE CANNOT rescue this
                            (it coalesces small partitions and splits
                            skew-JOIN partitions; it never splits a
                            too-coarse agg/sort partition)
  2g x  4 parts, AQE off  — same, pure (no runtime replan at all)
  2g x 64 parts, AQE off  — pressure + right-sized by hand
  2g x 256 parts, AQE on  — the production recipe: over-provision the
                            static count, let AQE coalesce to its
                            advisory target

Usage:
  python tools/spill_probe.py [--src /root/testdata/sf0.1] [--replicas 100]
                              [--out-root /tmp/spill_probe]
                              [--shapes agg,sort,join]

Prints one JSON line per (config, shape) plus a checksum-parity summary;
exits non-zero if any config's checksum disagrees or any run dies.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: (name, heap, threads, shuffle_partitions, aqe, expect_oom)
#:
#: The pressure tier holds CONCURRENCY fixed at 8 threads so the heap
#: available per concurrent task is the controlled variable and
#: shuffle.partitions is the knob under test; the boundary config keeps
#: the bench's 32 threads on the small heap to document the other sizing
#: rule — heap must scale with concurrent task count, and below the floor
#: the job OOMs outright rather than spilling (expected, recorded as a
#: labeled boundary outcome).
CONFIGS = [
    ("baseline_8g_32t_32p_aqe", "8g", 32, 32, True, False, 0),
    ("coarse_2g_8t_8p_noaqe", "2g", 8, 8, False, False, 0),
    ("coarse_2g_8t_8p_aqe", "2g", 8, 8, True, False, 0),
    ("right_2g_8t_64p_noaqe", "2g", 8, 64, False, False, 0),
    ("overprov_2g_8t_256p_aqe", "2g", 8, 256, True, False, 0),
    # split-size control: same config as right_* but with 16 MB input
    # splits (3x the scan tasks). Measured OUTCOME: map-side partial-agg
    # spill is BYTE-IDENTICAL to the 128 MB-split runs — high-cardinality
    # partial agg spills exactly its state's excess over the execution
    # pool, invariant to split count and shuffle partitions. Kept in the
    # matrix as the documented negative result.
    ("splitctl_2g_8t_64p_16mb", "2g", 8, 64, False, False, 16),
    ("boundary_2g_32t_32p_aqe", "2g", 32, 32, True, True, 0),
]

#: remedy validation for the over-provision config: same 256p + AQE, but
#: the coalescing advisory lowered from its 64 MB default to 8 MB so the
#: decompressed operator state per coalesced partition fits the ~150 MB
#: per-task execution share. Run via --validate-advisory (kept out of the
#: default matrix: it exists to check the BASELINE recommendation, not to
#: re-measure the landscape). The comparison set re-runs the two configs
#: the remedy sits between: over-provision with the default advisory
#: (the problem) and explicit 64p (the hand-sized winner).
ADVISORY_CONFIGS = [
    ("overprov_2g_8t_256p_aqe", "2g", 8, 256, True, False, 0, 0),
    ("remedy_2g_8t_256p_aqe_8mb", "2g", 8, 256, True, False, 0, 8),
    ("right_2g_8t_64p_noaqe", "2g", 8, 64, False, False, 0, 0),
]

SHAPES = ("agg", "sort", "join")


# ---------------------------------------------------------------------------
# worker: one config, fresh JVM


def _fetch_stage_metrics(spark, seen_stage_ids: set[int]) -> dict:
    """Sum spill/task counters over completed stages NOT in
    ``seen_stage_ids`` (per-shape attribution when several shapes share
    one JVM), then add the new ids to the set."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as resp:
        stages = json.load(resp)
    fresh = [s for s in stages if s.get("stageId") not in seen_stage_ids]
    seen_stage_ids.update(s.get("stageId") for s in stages)
    return {
        "memory_spilled_mb": round(
            sum(s.get("memoryBytesSpilled", 0) for s in fresh) / 1e6, 1
        ),
        "disk_spilled_mb": round(
            sum(s.get("diskBytesSpilled", 0) for s in fresh) / 1e6, 1
        ),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in fresh) / 1e6, 1
        ),
        "n_stages": len(fresh),
        "max_stage_tasks": max((s.get("numTasks", 0) for s in fresh), default=0),
    }


def _shape_dfs(spark, sf_dir: str, shape: str):
    """Per shape: (plan to EXECUTE — the memory-pressure shape — and plan
    to CHECKSUM — a small result proving every config computed the same
    answer). They are the same plan except for ``sort``, where any
    checksum over rows is order-independent by construction, so the
    executed plan is the full range-partitioned sort (to a noop sink) and
    the parity check is the sort-free projection it permutes."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    if shape == "agg":
        # Q18's core: hash agg over the full 60M rows, ~15M groups, then a
        # HAVING-style filter so the checksummed result stays small.
        out = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .filter(F.col("sum_qty") > 300)
        )
        return out, out
    if shape == "sort":
        # true global sort: range exchange across shuffle.partitions, then
        # per-partition external sort (the spilling operator under probe)
        proj = li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        return (
            proj.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"),
            proj,
        )
    if shape == "join":
        ords = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        out = (
            li.join(ords, li.l_orderkey == ords.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,2)"
                    )
                ).alias("revenue"),
            )
        )
        return out, out
    raise ValueError(shape)


def run_worker(
    sf_dir: str,
    heap: str,
    threads: int,
    parts: int,
    aqe: bool,
    shapes: list[str],
    max_part_mb: int = 0,
    advisory_mb: int = 0,
) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.session import RUNTIME_CONF

    builder = (
        SparkSession.builder.appName("spill_probe_worker")
        .master(f"local[{threads}]")
        .config("spark.driver.memory", heap)
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        # force SMJ for the join shape: a broadcast would dodge the
        # shuffle whose memory behavior is exactly what's probed
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    )
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    if max_part_mb:
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", f"{max_part_mb}m"
        )
    if advisory_mb:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", f"{advisory_mb}m"
        )
    spark.sparkContext.setLogLevel("ERROR")

    seen_stage_ids: set[int] = set()
    for shape in shapes:
        t0 = time.perf_counter()
        exec_df, check_df = _shape_dfs(spark, sf_dir, shape)
        if exec_df is not check_df:
            exec_df.write.mode("overwrite").format("noop").save()
        # decimal accumulator: sum of 60M 64-bit hashes overflows a long,
        # which ANSI mode (Spark 4 default) would reject
        row = check_df.select(
            F.count("*").alias("n"),
            F.sum(
                F.xxhash64(*check_df.columns).cast("decimal(38,0)")
            ).alias("checksum"),
        ).collect()[0]
        wall = round(time.perf_counter() - t0, 2)
        time.sleep(0.5)  # let the status store settle on the last stage
        metrics = _fetch_stage_metrics(spark, seen_stage_ids)
        print(
            json.dumps(
                {
                    "shape": shape,
                    "wall_s": wall,
                    "rows": row["n"],
                    "checksum": str(row["checksum"]),
                    **metrics,
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


# ---------------------------------------------------------------------------
# parent: synthesize once, fan out fresh-JVM workers


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--out-root", default="/tmp/spill_probe")
    ap.add_argument("--shapes", default=",".join(SHAPES))
    ap.add_argument(
        "--validate-advisory",
        action="store_true",
        help="run only the advisory-remedy comparison set (overprov vs "
        "8 MB-advisory remedy vs explicit 64p) instead of the full matrix",
    )
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--sf-dir", help=argparse.SUPPRESS)
    ap.add_argument("--heap", help=argparse.SUPPRESS)
    ap.add_argument("--threads", type=int, help=argparse.SUPPRESS)
    ap.add_argument("--parts", type=int, help=argparse.SUPPRESS)
    ap.add_argument("--aqe", help=argparse.SUPPRESS)
    ap.add_argument("--max-part-mb", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--advisory-mb", type=int, default=0, help=argparse.SUPPRESS)
    args = ap.parse_args()
    shapes = [s for s in args.shapes.split(",") if s]

    if args.worker:
        return run_worker(
            args.sf_dir,
            args.heap,
            args.threads,
            args.parts,
            args.aqe == "true",
            shapes,
            args.max_part_mb,
            args.advisory_mb,
        )

    # synthesize the 100x relational corpus in a normal-sized session,
    # reusing the scale probe's deterministic key-shifted replication
    from multiomix_aws_emr_spark.session import build_session
    from tools.scale_probe import synthesize

    spark = build_session(app_name="spill_probe_synth")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = synthesize(
        spark,
        "relational",
        args.src,
        os.path.join(args.out_root, f"relational_{args.replicas}x"),
        args.replicas,
    )
    spark.stop()

    configs = (
        ADVISORY_CONFIGS
        if args.validate_advisory
        else [c + (0,) for c in CONFIGS]
    )
    results: dict[str, list[dict]] = {}
    failed = False
    for name, heap, threads, parts, aqe, expect_oom, max_part_mb, advisory_mb in configs:
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--worker",
            "--sf-dir",
            sf_dir,
            "--heap",
            heap,
            "--threads",
            str(threads),
            "--parts",
            str(parts),
            "--aqe",
            "true" if aqe else "false",
            "--max-part-mb",
            str(max_part_mb),
            "--advisory-mb",
            str(advisory_mb),
            "--shapes",
            ",".join(shapes),
        ]
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        rows = []
        for line in proc.stdout.splitlines():
            try:
                rows.append(json.loads(line))
            except ValueError:
                continue
        if proc.returncode != 0 or len(rows) != len(shapes):
            oom = "OutOfMemoryError" in proc.stderr
            if expect_oom and oom:
                # the boundary config exists to document exactly this
                print(
                    json.dumps(
                        {
                            "config": name,
                            "outcome": "oom_as_expected",
                            "completed_shapes": [r["shape"] for r in rows],
                        }
                    ),
                    flush=True,
                )
            else:
                failed = True
                print(
                    json.dumps(
                        {
                            "config": name,
                            "error": f"worker rc={proc.returncode}"
                            + (" (OOM)" if oom else ""),
                            "stderr_tail": proc.stderr[-800:],
                        }
                    ),
                    flush=True,
                )
            continue
        if expect_oom:
            # the sizing floor moved — surface that loudly rather than
            # silently folding the boundary run into the results
            print(
                json.dumps({"config": name, "outcome": "expected_oom_but_completed"}),
                flush=True,
            )
        for r in rows:
            print(json.dumps({"config": name, **r}), flush=True)
            results.setdefault(r["shape"], []).append({"config": name, **r})

    # checksum parity: every config must compute the identical answer
    parity_ok = True
    for shape, rows in results.items():
        checks = {(r["rows"], r["checksum"]) for r in rows}
        ok = len(checks) == 1
        parity_ok &= ok
        print(
            json.dumps(
                {
                    "shape": shape,
                    "checksum_parity": ok,
                    "n_configs": len(rows),
                }
            ),
            flush=True,
        )
    return 0 if parity_ok and not failed else 1


if __name__ == "__main__":
    sys.exit(main())
