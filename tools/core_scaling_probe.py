"""Strong-scaling probe: wall time of scale-critical shapes vs core count.

The 10x/100x volume probes (tools/scale_probe.py) show wall time grows
sublinearly with DATA on a fixed 32-thread host. This probe measures the
other axis of the 100 TB claim: with DATA FIXED at the 100x synthetic
corpus, does adding cores actually speed the shapes up? A shape whose
wall time keeps falling as cores double is parallelism-bound (more
executors help — the property a 1000-executor cluster needs); a flat
curve would expose a serial bottleneck (driver loop, single-partition
stage, unsplittable shuffle) that plan review missed.

Method: for each N in --cores-list, a FRESH subprocess builds a
``local[N]`` session with ``spark.sql.shuffle.partitions = N`` (a fresh
JVM per N — core count is a static cluster property, not a runtime conf)
and times the tier's queries on the SAME materialized corpus: one warm
pass for codegen/scan caches, then min of --reps measured passes. The
parent aggregates speedup(N) = wall(min cores) / wall(N) per query.

The corpus is synthesized once (via tools/scale_probe.synthesize, the
deterministic no-RNG scrambler) and reused across all N, so every
subprocess times identical bytes.

Usage:
  python tools/core_scaling_probe.py [--tier documents] [--replicas 100]
      [--cores-list 4,8,16,32] [--reps 2] [--jvm-runs 1]
      [--src /root/testdata/sf0.1] [--out-root /tmp/scale_probe]

``--jvm-runs J`` launches J independent subprocesses per core count and
takes the per-query min across JVMs (the BASELINE §C core-sweep table
was recorded with J=2; the cross-JVM min dampens host-noise windows).

Prints one JSON line per core count plus a speedup summary; exits
non-zero if any query FAILS TO SCALE: speedup at the top core count
below --min-speedup (default 2.0 over an 8x core range — deliberately
lenient, small corpora leave cores idle at the top end).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def speedup_summary(
    results: dict[int, dict[str, float]],
    queries: tuple[str, ...],
    min_speedup: float,
    wall_floor: float = 2.0,
) -> tuple[dict[str, float], list[str]]:
    """speedup(top cores) = wall(min cores)/wall(max cores) per query, and
    the queries whose speedup falls below ``min_speedup`` (flat curve =
    serial bottleneck). Queries whose base wall is under ``wall_floor``
    are exempt from the requirement: at a couple of seconds the wall is
    fixed per-query overhead (plan compile, stage scheduling), there is
    nothing left to parallelize, and a flat curve proves nothing."""
    base, top = min(results), max(results)
    speedup = {
        q: round(results[base][q] / max(results[top][q], 0.01), 2)
        for q in queries
    }
    flat = [
        q
        for q, s in speedup.items()
        if s < min_speedup and results[base][q] >= wall_floor
    ]
    return speedup, flat


def run_worker(cores: int, tier: str, sf_dir: str, reps: int) -> None:
    """Child-process body: time the tier's queries at local[cores]."""
    from multiomix_aws_emr_spark.queries import QUERIES
    from multiomix_aws_emr_spark.session import build_session

    from tools.scale_probe import TIER_QUERIES

    spark = build_session(
        app_name=f"core_scaling_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    sec: dict[str, float] = {}
    for qid in TIER_QUERIES[tier]:
        runs = []
        for rep in range(reps + 1):  # rep 0 is the warm pass
            t0 = time.perf_counter()
            QUERIES[qid](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            if rep > 0:
                runs.append(time.perf_counter() - t0)
        sec[qid] = round(min(runs), 2)
    spark.stop()
    print(json.dumps({"cores": cores, "tier": tier, "sec": sec}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="documents")
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--cores-list", default="4,8,16,32")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--jvm-runs", type=int, default=1,
                    help="independent JVMs per core count; min is taken")
    ap.add_argument("--min-speedup", type=float, default=2.0)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out-root", default="/tmp/scale_probe")
    ap.add_argument("--worker-cores", type=int, default=None,
                    help="internal: run as the timing subprocess")
    ap.add_argument("--sf-dir", default=None, help="internal: corpus dir")
    args = ap.parse_args()

    # Argument validation (ADVICE r5): reps=0 would leave the measured-run
    # list empty (only the warm pass executes) and min() would raise a
    # bare ValueError deep in the worker; a worker invocation without
    # --sf-dir would pass sf_dir=None into the query loaders.
    if args.reps < 1:
        ap.error("--reps must be >= 1 (rep 0 is the unmeasured warm pass)")
    if args.jvm_runs < 1:
        ap.error("--jvm-runs must be >= 1")
    if args.worker_cores is not None:
        if args.sf_dir is None:
            ap.error("--worker-cores requires --sf-dir (the corpus dir)")
        run_worker(args.worker_cores, args.tier, args.sf_dir, args.reps)
        return 0

    cores_list = sorted({int(c) for c in args.cores_list.split(",")})
    if len(cores_list) < 2:
        # A single core count makes speedup(base==top) identically 1.0 for
        # every query, so every heavy shape would be flagged "not scaling"
        # and the probe would exit non-zero on a degenerate input.
        ap.error("--cores-list needs at least two distinct core counts")

    # Materialize (or reuse) the scaled corpus once, with a throwaway
    # full-width session, so every per-N subprocess times identical bytes.
    from multiomix_aws_emr_spark.session import build_session

    from tools.scale_probe import TIER_QUERIES, synthesize

    out_dir = os.path.join(args.out_root, f"{args.tier}_{args.replicas}x")
    spark = build_session(app_name="core_scaling_synth")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, args.tier, args.src, out_dir, args.replicas)
    spark.stop()

    results: dict[int, dict[str, float]] = {}
    for cores in cores_list:
        per_jvm: list[dict[str, float]] = []
        for _ in range(args.jvm_runs):
            try:
                proc = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--worker-cores", str(cores),
                        "--tier", args.tier,
                        "--sf-dir", out_dir,
                        "--reps", str(args.reps),
                    ],
                    capture_output=True,
                    text=True,
                    check=True,
                )
            except subprocess.CalledProcessError as exc:
                # Surface the worker's captured streams — without this the
                # CalledProcessError hides the actual Spark/Python error.
                print(exc.stdout, file=sys.stderr)
                print(exc.stderr, file=sys.stderr)
                raise
            json_lines = [
                ln for ln in proc.stdout.splitlines() if ln.startswith("{")
            ]
            if not json_lines:
                raise RuntimeError(
                    f"worker local[{cores}] exited 0 but printed no JSON "
                    f"result line.\nstdout:\n{proc.stdout}\n"
                    f"stderr:\n{proc.stderr}"
                )
            line = json_lines[-1]
            per_jvm.append(json.loads(line)["sec"])
            print(line)
        results[cores] = {
            q: min(run[q] for run in per_jvm) for q in per_jvm[0]
        }

    speedup, flat = speedup_summary(
        results, TIER_QUERIES[args.tier], args.min_speedup
    )
    print(
        json.dumps(
            {
                "tier": args.tier,
                "replicas": args.replicas,
                f"speedup_{cores_list[0]}to{cores_list[-1]}_cores": speedup,
                "min_speedup_required": args.min_speedup,
                "not_scaling": flat,
            }
        )
    )
    return 1 if flat else 0


if __name__ == "__main__":
    sys.exit(main())
