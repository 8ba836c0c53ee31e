#!/usr/bin/env python
"""A/B probe: MLlib KMeans init mode cost inside ml_kmeans_embeddings.

OPTIMIZATION_r15.md lists ml_kmeans_embeddings (floor 4.03 s) as "MLlib's
own fit-loop aggregates" — k-means|| init (initSteps=2) adds ~4-6 extra
distributed passes before the Lloyd iterations. The declared OUTPUT is the
invariant grid (nonempty / conservation / wss<=tss booleans), which is
init-independent as long as no cluster collapses, so a faster init is a
candidate optimization IF (a) it is actually faster wall-clock at the
bench methodology (fit may converge in fewer Lloyd rounds from the better
k-means|| seeds, cancelling the init saving) and (b) the 8-row output is
bit-identical at every fixture SF (proven separately via
tools/parity_check.py before any landing).

Usage: python tools/kmeans_init_probe.py [--reps N]   (default 3)
Prints per-arm fit+output wall times (min over reps) at $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.session import build_session
    from multiomix_aws_emr_spark.sources.tables import load, scan_parallel

    spark = build_session(app_name="kmeans-init-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def features():
        return (
            scan_parallel(load(spark, sf_dir, "embeddings"))
            .select(
                "vec_id",
                array_to_vector(
                    F.transform("embedding", lambda x: x.cast("double"))
                ).alias("features"),
            )
        )

    # Warm scan + codegen once so arm order doesn't bias.
    features().write.mode("overwrite").format("noop").save()

    results: dict[str, dict] = {}
    for mode in ("k-means||", "random"):
        walls, iters, nonempty = [], [], []
        for _ in range(reps):
            e = features().persist()
            t0 = time.perf_counter()
            km = KMeans(k=8, seed=42, maxIter=10)
            if mode == "random":
                km = km.setInitMode("random")
            model = km.fit(e)
            sizes = model.summary.clusterSizes
            walls.append(round(time.perf_counter() - t0, 3))
            iters.append(model.summary.numIter)
            nonempty.append(all(s > 0 for s in sizes))
            e.unpersist()
        results[mode] = {
            "min_fit_sec": min(walls),
            "walls": walls,
            "num_iter": iters,
            "all_nonempty": all(nonempty),
        }
    import json

    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "arms": results}))
    spark.stop()


if __name__ == "__main__":
    main()
