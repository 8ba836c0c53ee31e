"""local-cluster vs local[*] A/B: the one axis a single JVM cannot see.

Every scale number recorded so far (BASELINE.md §C-D) ran on local[32]:
one JVM, where "broadcast" is a local memory store reference, "shuffle
fetch" is a local disk read, and closure/Arrow serialization crosses no
process boundary on the JVM side. A real cluster pays all three. Spark's
``local-cluster[N, cores, mem_mb]`` master launches N REAL executor JVMs
(separate processes, real Netty block transfer, real torrent-broadcast,
real serialized task closures and Python workers per executor), which is
the closest a single host gets to multi-executor behavior.

This probe times the heaviest recorded shapes under both masters with the
SAME total core/memory budget and reports the walls side by side:

  q18_1000x     sql_large_volume_customer at the 1000x key-shifted
                relational synth (600M-row lineitem) — the biggest
                shuffle + join volume in the repo's record
  near_minhash_100x
                dedup_near_minhash at the 100x scrambled-copy documents
                synth — banded LSH: wide exploded shuffle + groupBy
  fs_bbha_embeddings
                the grouped-Arrow metaheuristic at sf0.1 — broadcast
                payload + applyInPandas closures, the python-worker-
                per-executor serialization path

Synthetic dirs are produced by tools/scale_probe.synthesize (pure
deterministic expressions) with a plain local[32] session and REUSED for
both masters — only query execution is A/B'd.

Usage:
  python tools/localcluster_probe.py [--out-root /tmp/scale_probe]
      [--executors 2] [--exec-cores 16] [--exec-mem-mb 24576]
      [--skip-synth]   # fail instead of synthesizing when dirs missing

One JSON line per (master, shape) with min-of-2 warm walls, plus a
summary line with the local-cluster/local ratios. Clean up the synth dirs
after recording results (they are reproducible): rm -rf /tmp/scale_probe*
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import synthesize  # noqa: E402


def _session(
    master: str,
    app: str,
    driver_mem_mb: int | None = None,
    exec_mem_mb: int | None = None,
):
    """Equal-budget session. Two memory knobs this probe found the hard
    way (both first runs failed):

    * local[*]: the driver JVM IS the executor fleet, so its heap must
      match the summed executor memory the local-cluster side gets
      (q18_1000x OOM'd at the 8g default — BASELINE.md's 1000x rule is
      ~1.5 GB/task);
    * local-cluster[n,cores,MEM]: MEM sizes the WORKER budget only —
      executors still launch at the 1g ``spark.executor.memory`` default
      (-Xmx1024M observed in the executor command) and die mid-stage, so
      the executor heap must be set explicitly.
    """
    from multiomix_aws_emr_spark.session import build_session

    owned = os.environ.get("_LC_PROBE_MEM_OWNED")
    if "SPARK_GRAFT_DRIVER_MEM" not in os.environ or owned:
        if driver_mem_mb is not None:
            os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{driver_mem_mb}m"
            os.environ["_LC_PROBE_MEM_OWNED"] = "1"
        elif owned:
            del os.environ["SPARK_GRAFT_DRIVER_MEM"]
            del os.environ["_LC_PROBE_MEM_OWNED"]
    extra = (
        {"spark.executor.memory": f"{exec_mem_mb}m"} if exec_mem_mb else None
    )
    spark = build_session(app_name=app, master=master, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _time_query(spark, qid: str, sf_dir: str, runs: int = 2) -> tuple[float, float]:
    """(cold, warm-min) walls of a noop-sink execution. The cold first
    run matters here more than in tools/scale_probe: queries backed by
    the session-scoped sketch cache (dedup_near_minhash) pay their wide
    exploded shuffle only on the first execution per session+corpus, so
    the warm min times the cache-hit plan. Both are A/B-relevant — cold
    exercises the full cross-executor shuffle, warm the persisted-block
    reuse path (cached blocks live ON the executors under
    local-cluster)."""
    from multiomix_aws_emr_spark.queries import QUERIES

    walls = []
    for _ in range(runs + 1):
        t0 = time.perf_counter()
        QUERIES[qid](spark, sf_dir).write.mode("overwrite").format("noop").save()
        walls.append(round(time.perf_counter() - t0, 2))
    return walls[0], min(walls[1:])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out-root", default="/tmp/scale_probe")
    ap.add_argument("--executors", type=int, default=2)
    ap.add_argument("--exec-cores", type=int, default=16)
    ap.add_argument("--exec-mem-mb", type=int, default=24576)
    ap.add_argument("--skip-synth", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    rel_dir = os.path.join(args.out_root, "relational_1000x")
    doc_dir = os.path.join(args.out_root, "documents_100x")
    need = [d for d in (rel_dir, doc_dir) if not os.path.exists(d)]
    if need:
        if args.skip_synth:
            print(f"missing synth dirs: {need}", file=sys.stderr)
            return 2
        spark = _session(None, "lc_probe_synth")
        if not os.path.exists(rel_dir):
            synthesize(spark, "relational", args.src, rel_dir, 1000)
        if not os.path.exists(doc_dir):
            synthesize(spark, "documents", args.src, doc_dir, 100)
        spark.stop()
        gc.collect()

    shapes = [
        ("q18_1000x", "sql_large_volume_customer", rel_dir),
        ("near_minhash_100x", "dedup_near_minhash", doc_dir),
        ("fs_bbha_embeddings", "fs_bbha_embeddings", args.src),
    ]
    # same total budget: local[2*cores] one JVM (heap = summed executor
    # memory) vs N executor JVMs of cores/mem each (driver stays at the
    # build_session default — it runs no tasks under local-cluster).
    total_cores = args.executors * args.exec_cores
    total_mem_mb = args.executors * args.exec_mem_mb
    masters = [
        (f"local[{total_cores}]", "local", total_mem_mb, None),
        (
            f"local-cluster[{args.executors},{args.exec_cores},{args.exec_mem_mb}]",
            "local-cluster",
            None,
            args.exec_mem_mb,
        ),
    ]
    results: dict[str, dict[str, float]] = {}
    for master, label, mem_mb, exec_mem in masters:
        spark = _session(
            master, f"lc_probe_{label}", driver_mem_mb=mem_mb, exec_mem_mb=exec_mem
        )
        for name, qid, sf_dir in shapes:
            cold, warm = _time_query(spark, qid, sf_dir, runs=args.runs)
            results.setdefault(name, {})[label] = (cold, warm)
            print(
                json.dumps(
                    {
                        "master": master,
                        "shape": name,
                        "qid": qid,
                        "cold_wall_sec": cold,
                        "warm_wall_sec": warm,
                    }
                ),
                flush=True,
            )
        spark.stop()
        gc.collect()

    ratios = {
        name: {
            "cold": round(w["local-cluster"][0] / max(w["local"][0], 0.01), 2),
            "warm": round(w["local-cluster"][1] / max(w["local"][1], 0.01), 2),
        }
        for name, w in results.items()
    }
    print(
        json.dumps(
            {
                "summary": "local-cluster_over_local_wall_ratio",
                "executors": args.executors,
                "exec_cores": args.exec_cores,
                "exec_mem_mb": args.exec_mem_mb,
                "ratios": ratios,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
