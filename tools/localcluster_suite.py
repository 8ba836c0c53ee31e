"""Run the ENTIRE declared 177-query suite under local-cluster.

tools/localcluster_probe.py A/Bs five heavy shapes; this runs everything
bench.py runs — every relational/streaming/Python-source/sink/UDF/
metaheuristic query — against 2 REAL executor JVMs, so any
serialization, closure-shipping, Arrow-transport, or state-store bug
that a single JVM masks fails loudly here. The driver's correctness
gate can't do this (it builds its own local session); this is the
multi-JVM smoke for the full surface.

Mechanism: build the local-cluster session FIRST, then call bench.main()
— its build_session() resolves through SparkSession.builder.getOrCreate,
which returns the already-running session, so the unmodified bench loop
(warm-ups, failure isolation, one-JSON-line output) runs under this
master. The JVM heap note from tools/localcluster_probe.py applies: this
must be the process's first session.

Usage:
  python tools/localcluster_suite.py [--executors 2] [--exec-cores 16]
      [--exec-mem-mb 24576]
Output: bench.py's own JSON line (n_errors is the headline number — a
non-zero count lists exactly which queries break across process
boundaries), prefixed by one line naming the master.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--executors", type=int, default=2)
    ap.add_argument("--exec-cores", type=int, default=16)
    ap.add_argument("--exec-mem-mb", type=int, default=24576)
    args = ap.parse_args()

    from multiomix_aws_emr_spark.session import build_session

    master = f"local-cluster[{args.executors},{args.exec_cores},{args.exec_mem_mb}]"
    spark = build_session(
        app_name="bench_localcluster",
        master=master,
        extra_conf={"spark.executor.memory": f"{args.exec_mem_mb}m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"master": master}), flush=True)

    import bench

    bench.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
