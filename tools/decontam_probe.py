"""Volume probe for decontaminate_ngram (benchmark decontamination):
the broadcast gram-probe at 10x/100x the sf0.1 training corpus against
a FIXED evaluation split — the production regime (benchmark suites are
MB-scale constants; the training corpus is what grows to 100 TB).

What scales how: the training-side gram explode is row-local; the eval
inventory is replication-INVARIANT (the probe holds the eval split
fixed, as production does), so the broadcast stays the same few MB at
every corpus size and the collision test remains a map-side hash probe.
The only exchange is the per-doc aggregate, whose distinct-partial phase
collapses non-hits to one null cell per doc per partition — shuffle rows
~ (hits + docs x partitions), never grams. Replication witnesses (text
unchanged, doc_id shifted): contaminated-doc count and total hit grams
must scale EXACTLY linearly in the replica count (each copy of a
contaminated doc collides identically), and the eval inventory must not
move — a correctness check at volume, not just a wall.

Usage: python tools/decontam_probe.py [--replicas 10 100] [--src .../sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, nargs="+", default=[1, 10, 100])
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/decontam_probe")
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.dedup import ngram_contamination
    from multiomix_aws_emr_spark.session import build_session
    from multiomix_aws_emr_spark.sources.tables import load

    spark = build_session(
        app_name="decontam_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    base = load(spark, args.src, "documents").select("doc_id", "text")
    is_eval = F.col("doc_id") % 20 == 0
    evalset = base.filter(is_eval)
    n_eval_grams = (
        evalset.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
                        - (args.k - 1),
                    ),
                    lambda i: F.array_join(
                        F.slice(
                            F.filter(F.split("text", " "), lambda x: x != ""),
                            i,
                            args.k,
                        ),
                        " ",
                    ),
                )
            ).alias("gram")
        )
        .distinct()
        .count()
    )

    results = []
    for r in args.replicas:
        out = os.path.join(args.workdir, f"train_{r}x.parquet")
        if not os.path.isdir(out):
            # replicate the TRAIN side only: doc_id shifted, text
            # unchanged (production growth is more corpus, same suite)
            k_idx = F.explode(
                F.sequence(F.lit(0), F.lit(r - 1))
            ).alias("k")
            base.filter(~is_eval).select("*", k_idx).select(
                (F.col("doc_id") * r + F.col("k")).alias("doc_id"), "text"
            ).repartition(32).write.mode("overwrite").parquet(out)

        train = spark.read.parquet(out)
        t0 = time.time()
        scored = ngram_contamination(
            train, evalset, id_col="doc_id", text_col="text", k=args.k
        )
        agg = scored.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("contaminated").cast("long")).alias("n_contam"),
            F.sum("n_hit_grams").alias("hit_grams_total"),
        ).collect()[0]
        wall = round(time.time() - t0, 2)
        results.append(
            {
                "replicas": r,
                "wall_sec": wall,
                "n_train_docs": agg.n_docs,
                "n_contaminated": agg.n_contam,
                "hit_grams_total": agg.hit_grams_total,
                "n_eval_grams": n_eval_grams,
            }
        )
        print(json.dumps(results[-1]))

    # linearity witness across the sweep
    if len(results) >= 2:
        r0 = results[0]
        for r in results[1:]:
            scale = r["replicas"] / r0["replicas"]
            for key in ("n_contaminated", "hit_grams_total", "n_train_docs"):
                want = r0[key] * scale
                assert r[key] == want, (key, r[key], want)
        print("linearity witness: exact at every scale")
    print(json.dumps({"probe": "decontaminate_ngram", "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
