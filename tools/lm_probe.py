"""Volume probe for the bigram-LM quality scorer (operators/lm.py).

What scales how: training is two map-side-combinable count aggregations
over one tokenize pass (unigram and bigram TYPE tables grow sublinearly
under corpus replication — the realistic regime: corpus grows, vocabulary
saturates); scoring is three equi-joins on token keys (stopword-headed
skew absorbed by AQE skew-join) plus one per-doc aggregate. Nothing
collects to the driver; the model is a pair of DataFrames.

Probe: replicate the sf0.1 documents table Rx (doc_ids offset per
replica), train on the replicated corpus, score the same corpus, force
full evaluation with a global checksum aggregate. Report walls, corpus
rows, model sizes, and the hot-key witness (max single-token count).

Usage: python tools/lm_probe.py [--replicas 10 100] [--src .../sf0.1]
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
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.lm import (
        score_bigram_lm,
        train_bigram_lm,
    )
    from multiomix_aws_emr_spark.session import build_session

    spark = build_session(
        app_name="lm_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    base = spark.read.parquet(f"{args.src}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()
    results = []
    for r in args.replicas:
        docs = (
            base.crossJoin(
                spark.range(r).withColumnRenamed("id", "_rep")
            )
            .select(
                (F.col("doc_id") + F.col("_rep") * F.lit(10_000_000)).alias(
                    "doc_id"
                ),
                "text",
            )
        )
        t0 = time.perf_counter()
        model = train_bigram_lm(docs)
        # materialize the model the way a pipeline would: persist + size
        for k in ("bigrams", "unigrams"):
            model[k] = model[k].persist()
        n_bigram_types = model["bigrams"].count()
        n_unigram_types = model["unigrams"].count()
        hot = model["unigrams"].agg(F.max("c1")).collect()[0][0]
        train_wall = time.perf_counter() - t0

        t0 = time.perf_counter()
        chk = (
            score_bigram_lm(docs, model)
            .agg(
                F.count("*").alias("docs"),
                F.sum("n_bigrams").alias("pairs"),
                F.round(F.sum("avg_log2_s"), 2).alias("chk"),
            )
            .collect()[0]
        )
        score_wall = time.perf_counter() - t0
        for k in ("bigrams", "unigrams"):
            model[k].unpersist()
        results.append(
            {
                "replicas": r,
                "docs": n_base * r,
                "train_wall_sec": round(train_wall, 1),
                "score_wall_sec": round(score_wall, 1),
                "unigram_types": n_unigram_types,
                "bigram_types": n_bigram_types,
                "max_token_count": hot,
                "scored_docs": chk.docs,
                "scored_pairs": chk.pairs,
                "checksum": float(chk.chk),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"probe": "bigram_lm_scale", "results": results}))


if __name__ == "__main__":
    main()
