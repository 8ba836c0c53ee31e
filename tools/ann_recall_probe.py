"""ANN recall (not wall) at large corpus scale — VERDICT r7 task 4.

The recall@5 >= 0.6 contract behind `similarity_ann_lsh` / `similarity_ivf`
was measured up to 100x (200k vectors). Recall is NOT scale-invariant for
either tier:

- LSH: bucket occupancy grows linearly with the corpus while the number of
  probed buckets is fixed, so the candidate set stays a constant FRACTION —
  but on isotropic fixtures the top-5 neighbors are barely separated from
  the bulk, and a larger corpus has more near-ties crowding the true top-5
  out of probed buckets.
- IVF: cells grow linearly; fixed n_probe still scans the same fraction,
  but the true top-5 concentrate no better, so per-query recall gets a
  larger sample of the same Bernoulli — tighter mean, same expectation.

This probe measures it instead of arguing: synthesize the embeddings tier
at --replicas (the 1000x default = 2M vectors via tools/scale_probe's
orthogonal-transform replication, which preserves within-copy cosines
exactly), compute exact brute-force top-5 ONCE for a spread query set, and
report mean/min recall@5 per (tier, probe setting) alongside wall seconds
— the probe-count guidance BASELINE.md records.

The default synth keeps the fixture's ISOTROPIC geometry (no planted
neighbors — the worst case for any bucketing ANN, the no-structure lower
bound). --planted measures the other end of the guidance: each source
vector is replicated with a small deterministic perturbation
(x + 0.05*sin(a*vec_id + b*k + c*dim) per dim, within-family cosine
~0.97 against a ~unit-norm signal), so a query's true top-5 are its own
family — the concentrated-neighborhood geometry real embedding corpora
have. Same corpus size, same settings, directly comparable tables.

Usage:
  python tools/ann_recall_probe.py [--replicas 1000] [--n-queries 16]
      [--src /root/testdata/sf0.1] [--out-root /tmp/scale_probe] [--planted]

One JSON line per configuration; clean up /tmp/scale_probe* afterwards
(the synth is deterministic and reproducible).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import synthesize  # noqa: E402


def synthesize_planted(spark, src_dir: str, out_dir: str, replicas: int) -> str:
    """Replicate each source vector into a FAMILY of near-duplicates:
    copy k of vector v gets a deterministic per-dim perturbation
    ``0.05 * sin(7.13*vec_id + 3.77*k + 1.618*dim)`` (copy 0 keeps k=0's
    perturbation too, so queries are family members, not centroids).
    Against the fixture's ~unit-norm signal this lands within-family
    cosines ~0.97 — far above the isotropic bulk's ~0.3 top-5 — giving
    every query a concentrated true neighborhood, the geometry real
    (clustered) embedding corpora have and the orthogonal-flip synth
    deliberately destroys."""
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.sources.tables import load

    dst = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(dst):
        d = load(spark, src_dir, "embeddings").repartition(
            spark.sparkContext.defaultParallelism
        )
        rep = d.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("k")
        )
        perturbed = F.transform(
            F.col("embedding"),
            lambda x, i: (
                x
                + F.lit(0.05)
                * F.sin(
                    F.col("vec_id") * F.lit(7.13)
                    + F.col("k") * F.lit(3.77)
                    + i.cast("double") * F.lit(1.618)
                )
            ).cast("float"),
        )
        rep.select(
            (F.col("vec_id") * replicas + F.col("k")).alias("vec_id"),
            perturbed.alias("embedding"),
            "label",
        ).repartition(32).write.mode("overwrite").parquet(dst)
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out-root", default="/tmp/scale_probe")
    ap.add_argument("--replicas", type=int, default=1000)
    ap.add_argument("--n-queries", type=int, default=16)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument(
        "--planted",
        action="store_true",
        help="near-duplicate family synth (concentrated neighborhoods) "
        "instead of the isotropic orthogonal-flip synth",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.similarity import (
        ann_lsh_topk,
        exact_topk,
        ivf_topk,
        recall_per_query,
    )
    from multiomix_aws_emr_spark.session import build_session
    from multiomix_aws_emr_spark.sources.tables import load

    spark = build_session(app_name="ann_recall_probe")
    spark.sparkContext.setLogLevel("ERROR")

    if args.planted:
        big_dir = synthesize_planted(
            spark,
            args.src,
            os.path.join(args.out_root, f"embeddings_planted_{args.replicas}x"),
            args.replicas,
        )
    else:
        big_dir = synthesize(
            spark,
            "embeddings",
            args.src,
            os.path.join(args.out_root, f"embeddings_{args.replicas}x"),
            args.replicas,
        )
    e = load(spark, big_dir, "embeddings")
    n = e.count()
    # k=0 copies of the first n_queries original ids survive every
    # replica count (vec_id' = vec_id * replicas + k), spread by the
    # orthogonal transform like any other vector.
    query_ids = [i * args.replicas for i in range(args.n_queries)]

    t0 = time.perf_counter()
    exact = exact_topk(
        e, id_col="vec_id", vec_col="embedding", query_ids=query_ids, k=args.k
    ).cache()
    exact.count()
    wall_exact = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "corpus_vectors": n,
                "replicas": args.replicas,
                "geometry": "planted" if args.planted else "isotropic",
                "n_queries": args.n_queries,
                "k": args.k,
                "exact_brute_force_wall_sec": wall_exact,
            }
        ),
        flush=True,
    )

    def measure(label: str, params: dict, build):
        t0 = time.perf_counter()
        approx = build()
        rec = (
            recall_per_query(approx, exact, args.k)
            .agg(
                F.round(F.avg("recall_at_k"), 4).alias("mean"),
                F.round(F.min("recall_at_k"), 4).alias("min"),
            )
            .collect()[0]
        )
        wall = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "tier": label,
                    **params,
                    "recall_at_k_mean": rec["mean"],
                    "recall_at_k_min": rec["min"],
                    "meets_0.6_floor_mean": bool(rec["mean"] >= 0.6),
                    "wall_sec": wall,
                }
            ),
            flush=True,
        )

    # LSH: the declared contract setting (4 planes, hamming<=2) plus the
    # neighboring settings that bracket the probe-count guidance.
    for n_planes, hamming in [(4, 1), (4, 2), (6, 2), (6, 3)]:
        measure(
            "ann_lsh",
            {"n_planes": n_planes, "probe_hamming": hamming},
            lambda: ann_lsh_topk(
                e,
                id_col="vec_id",
                vec_col="embedding",
                query_ids=query_ids,
                k=args.k,
                n_planes=n_planes,
                probe_hamming=hamming,
            ),
        )

    # IVF: the declared contract quantizer ("sample", layout-independent)
    # across the probe counts that bracket the 0.6 floor.
    for n_centroids, n_probe in [(16, 2), (16, 4), (16, 8), (64, 16)]:
        measure(
            "ivf",
            {"n_centroids": n_centroids, "n_probe": n_probe, "quantizer": "sample"},
            lambda: ivf_topk(
                e,
                id_col="vec_id",
                vec_col="embedding",
                query_ids=query_ids,
                k=args.k,
                n_centroids=n_centroids,
                n_probe=n_probe,
                centroids="sample",
            ),
        )

    exact.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
