"""Volume A/B for the two unigram-rarity plan shapes (r15).

The declared ``text_unigram_rarity`` query explodes the token stream in
three INDEPENDENT subtrees (freq counts, corpus total, scoring join):
at fixture scale the redundant scans run concurrently on idle cores and
the critical path is minimal. The production component
``operators/quality.unigram_rarity`` derives everything from ONE
(doc, tok) type-table exchange (runtime exchange reuse — the
train_bigram_lm mechanism): 3x less scan/tokenize work and a
token-TYPES join payload instead of token occurrences, which is the
regime that matters once executors are saturated and the corpus no
longer fits a handful of scan tasks.

Probe: replicate the sf0.1 documents table Rx (doc_ids offset per
replica), run both shapes over the replicated frame, force full
evaluation with a global checksum aggregate, assert the checksums agree.
Report walls per shape per replica.

Usage: python tools/rarity_shape_probe.py [--replicas 1 10 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parallel_shape(docs):
    """The declared query's body (queries/textops.py
    text_unigram_rarity), parameterized on an input frame."""
    from pyspark.sql import functions as F

    tok = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "tok"
        ),
    )
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    total = tok.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    return (
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.col("n_total") / F.col("n_tok")), 4).alias(
                "rarity"
            ),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, nargs="+", default=[1, 10, 50])
    ap.add_argument(
        "--doc-repeat",
        type=int,
        default=1,
        help="concatenate each doc's text onto itself K times — raises "
        "per-doc token multiplicity, the regime where the type-table "
        "pre-aggregation actually compresses (long documents)",
    )
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.quality import unigram_rarity
    from multiomix_aws_emr_spark.session import build_session

    spark = build_session(
        app_name="rarity_shape_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{args.src}/documents.parquet").select(
        "doc_id", "text"
    )
    if args.doc_repeat > 1:
        base = base.select(
            "doc_id",
            F.array_join(
                F.array_repeat("text", args.doc_repeat), " "
            ).alias("text"),
        )
    n_base = base.count()

    def force(df):
        row = df.agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("toks"),
            F.round(F.sum("rarity"), 2).alias("chk"),
        ).collect()[0]
        return (row.docs, row.toks, float(row.chk))

    results = []
    for r in args.replicas:
        docs = (
            base.crossJoin(spark.range(r).withColumnRenamed("id", "_rep"))
            .select(
                (F.col("doc_id") + F.col("_rep") * F.lit(10_000_000)).alias(
                    "doc_id"
                ),
                "text",
            )
        )
        walls = {}
        checks = {}
        for name, fn in (
            ("parallel_scans", _parallel_shape),
            ("type_table", unigram_rarity),
        ):
            t0 = time.perf_counter()
            checks[name] = force(fn(docs))
            walls[name] = round(time.perf_counter() - t0, 2)
        # NOTE: checksums differ across shapes only in the rarity sum's
        # last rounded digit accumulation — doc/token counts must match
        # exactly; the rarity sums must agree to the rounding grain.
        assert checks["parallel_scans"][:2] == checks["type_table"][:2], checks
        drift = abs(checks["parallel_scans"][2] - checks["type_table"][2])
        results.append(
            {
                "replicas": r,
                "doc_repeat": args.doc_repeat,
                "docs": n_base * r,
                "wall_parallel_scans_sec": walls["parallel_scans"],
                "wall_type_table_sec": walls["type_table"],
                "checksum_drift": round(drift, 4),
                "checksum": checks["type_table"][2],
            }
        )
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"probe": "rarity_shape", "results": results}))


if __name__ == "__main__":
    main()
