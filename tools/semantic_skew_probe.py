"""Hot-cluster probe for the capped SemDeDup prune (r12 verdict's one
`weak`): one cluster holding EVERY vector — the boilerplate mega-cluster
shape a production embedding corpus produces exactly where a dedup pass
matters most — must complete under the default cap with bounded per-task
memory, where the uncapped form would materialize an m x m cosine matrix
(250k members -> 500 GB, 1M -> 8 TB: not a slowdown, an OOM kill).

Synth: dim-16 deterministic pseudo-random unit-ish vectors generated
JVM-side (sin-hash expressions — no driver-side data), all assigned
list_id=0. semantic_survivors(max_cluster=2048, tile=2048) re-splits the
cluster into ceil(m/2048) hash sub-clusters; the largest matrix any task
holds is 2048 x 2048 doubles (32 MB). Reported: wall, survivor count,
sub-cluster census (max group size must stay near the cap), and the
uncapped form's theoretical matrix bytes for contrast.

Usage: python tools/semantic_skew_probe.py [--n 250000] [--dim 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_one_cluster(spark, n: int, dim: int):
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("vec_id"))
    emb = F.array(
        *[
            F.sin((F.col("vec_id") + F.lit(7919 * d)) * F.lit(0.61803398875))
            for d in range(dim)
        ]
    )
    return base.select(
        "vec_id", emb.alias("emb"), F.lit(0).cast("int").alias("list_id")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=250_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--max-cluster", type=int, default=2048)
    ap.add_argument("--threshold", type=float, default=0.95)
    args = ap.parse_args()

    from multiomix_aws_emr_spark.operators.similarity import semantic_survivors
    from multiomix_aws_emr_spark.session import build_session
    from pyspark.sql import functions as F

    spark = build_session(
        app_name="semantic_skew_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    m = synth_one_cluster(spark, args.n, args.dim).persist()
    m.count()  # materialize the synth outside the timed window

    # sub-cluster census from the same split rule the operator applies
    nsub = max(1, -(-args.n // args.max_cluster))
    census = (
        m.groupBy(F.pmod(F.xxhash64("vec_id"), F.lit(nsub)).alias("_sub"))
        .count()
        .agg(
            F.max("count").alias("max_sub"),
            F.min("count").alias("min_sub"),
            F.count(F.lit(1)).alias("n_sub"),
        )
        .collect()[0]
    )

    t0 = time.time()
    survivors = semantic_survivors(
        m,
        id_col="vec_id",
        vec_col="emb",
        threshold=args.threshold,
        max_cluster=args.max_cluster,
    ).count()
    wall = time.time() - t0
    m.unpersist()

    print(
        json.dumps(
            {
                "n": args.n,
                "dim": args.dim,
                "max_cluster": args.max_cluster,
                "wall_sec": round(wall, 2),
                "survivors": survivors,
                "n_sub": census.n_sub,
                "max_sub": census.max_sub,
                "min_sub": census.min_sub,
                "capped_matrix_mb": round(
                    args.max_cluster * args.max_cluster * 8 / 1e6, 1
                ),
                "uncapped_matrix_gb": round(args.n * args.n * 8 / 1e9, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
