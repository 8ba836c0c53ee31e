"""Volume probe for dedup_substring_spans (exact-substring dedup): the
gram-inventory join at 10x/100x/1000x the sf0.1 documents table.

What scales how: the gram explode is row-local (5 slices per word
position, ~n_words rows per doc); the only wide operation is the
two-level hash-agg finding grams with >= 2 distinct docs (map-side
partial on (gram, doc), then per-gram distinct count — a hot gram
("click here to subscribe" x 10^6) combines down to one row per map
task, so there is no skew key reaching a single reducer), plus the
semi-join back (Catalyst broadcasts when the cross-doc inventory is
small). The per-doc interval merge windows on doc_id — bounded by doc
length, never corpus size. Report: wall, span rows, gram rows, dup-gram
inventory size, max single-gram doc frequency (the skew witness).

Usage: python tools/substring_probe.py [--replicas 10 100] [--src .../sf0.1]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scale_probe():
    sp = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scale_probe.py"
    )
    spec = importlib.util.spec_from_file_location("scale_probe", sp)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, nargs="+", default=[10, 100])
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/substring_probe")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.queries import QUERIES
    from multiomix_aws_emr_spark.session import build_session

    spark = build_session(
        app_name="substring_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    sp = _scale_probe()
    results = []
    for r in args.replicas:
        out_dir = os.path.join(args.workdir, f"docs_{r}x")
        if not os.path.isdir(os.path.join(out_dir, "documents.parquet")):
            sp.synthesize(spark, "documents", args.src, out_dir, r)

        t0 = time.time()
        df = QUERIES["dedup_substring_spans"](spark, out_dir)
        n_spans = df.count()
        wall = round(time.time() - t0, 2)

        # diagnostics outside the timed window: gram volume + skew witness
        k = 5
        words = F.filter(F.split("text", " "), lambda x: x != "")
        g = (
            spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
            .select("doc_id", words.alias("w"))
            .filter(F.size("w") >= k)
            .select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("w") - (k - 1)),
                        lambda i: F.array_join(F.slice("w", i, k), " "),
                    )
                ).alias("gram"),
            )
        )
        stats = (
            g.groupBy("gram")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .agg(
                F.count(F.lit(1)).alias("n_grams_distinct"),
                F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias(
                    "n_dup_grams"
                ),
                F.max("nd").alias("max_gram_docs"),
            )
            .collect()[0]
        )
        results.append(
            {
                "replicas": r,
                "wall_sec": wall,
                "n_spans": n_spans,
                "n_grams_distinct": stats.n_grams_distinct,
                "n_dup_grams": stats.n_dup_grams,
                "max_gram_docs": stats.max_gram_docs,
            }
        )
        print(json.dumps(results[-1]))
    print(json.dumps({"probe": "substring_spans", "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
