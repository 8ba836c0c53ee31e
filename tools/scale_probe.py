"""10x scale probe: verify the scale-critical document shapes grow ~linearly.

No fixture above sf0.1 exists in /root/testdata, so every 100 TB claim in
SURVEY.md §6 would otherwise rest on plan review alone. This probe
synthesizes a DETERMINISTIC ~10x documents table from sf0.1 and times the
five scale-critical shapes (VERDICT r4 #4) at both scales:

    dedup_near_minhash, dedup_minhash_components, pipeline_curation_v3,
    pipeline_shuffle_shards, text_unigram_rarity

Synthesis (pure JVM-side expressions, no RNG):
  each source doc is replicated REPLICAS times; copy k gets
  doc_id' = doc_id * REPLICAS + k and its words re-ordered by the
  copy-keyed hash sort key md5(word || '#' || k). A per-copy word
  permutation keeps the WORD MULTISET intact (token-level stats — length,
  unigram frequencies, quality ratios — match the source exactly) while
  wholesale rewriting the SHINGLE set, so:
    - copies of one doc are NOT near-dups of each other (distinct
      shingles) — the corpus-wide duplicate-pair count stays ~linear in
      the replication factor instead of exploding quadratically;
    - two docs that were near-dups in the source stay near-dups WITHIN
      each copy (same words -> same sort keys -> same reordering), so the
      duplicate STRUCTURE is preserved at 10x the volume.

Usage:  python tools/scale_probe.py [--replicas 10] [--out /tmp/scale_probe]
Prints one JSON line per scale plus a ratio summary; exits non-zero if any
probed query grew superlinearly beyond the tolerance (ratio > replicas *
SLACK).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_QUERIES = (
    "dedup_near_minhash",
    "dedup_minhash_components",
    "pipeline_curation_v3",
    "pipeline_shuffle_shards",
    "text_unigram_rarity",
)

#: superlinearity tolerance: wall ratio up to SLACK * replicas still counts
#: as linear (fixed per-query overheads, extra shuffle waves on a fixed
#: 32-thread host, and AQE plan variation all add constant-ish cost).
SLACK = 1.6


def synthesize(spark, src_dir: str, out_dir: str, replicas: int) -> str:
    """Materialize the replicated-scrambled documents table + links to the
    untouched sibling tables; returns the synthetic sf dir."""
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.sources.tables import TABLE_NAMES, load

    os.makedirs(out_dir, exist_ok=True)
    docs_path = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(docs_path):
        d = load(spark, src_dir, "documents")
        k = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("k")
        rep = d.select("*", k)
        scrambled = F.array_join(
            F.transform(
                F.array_sort(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.struct(
                            F.md5(
                                F.concat(w, F.lit("#"), F.col("k").cast("string"))
                            ).alias("h"),
                            w.alias("w"),
                        ),
                    )
                ),
                lambda s: s["w"],
            ),
            " ",
        )
        (
            rep.select(
                (F.col("doc_id") * replicas + F.col("k")).alias("doc_id"),
                scrambled.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(docs_path)
        )
    for t in TABLE_NAMES:
        if t == "documents":
            continue
        dst = os.path.join(out_dir, f"{t}.parquet")
        src = os.path.join(src_dir, f"{t}.parquet")
        if not os.path.exists(dst) and os.path.exists(src):
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    return out_dir


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    from multiomix_aws_emr_spark.queries import QUERIES

    out: dict[str, float] = {}
    for qid in PROBE_QUERIES:
        t0 = time.perf_counter()
        QUERIES[qid](spark, sf_dir).write.mode("overwrite").format("noop").save()
        out[qid] = round(time.perf_counter() - t0, 2)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_probe_10x")
    args = ap.parse_args()

    from multiomix_aws_emr_spark.session import build_session

    spark = build_session(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = synthesize(spark, args.src, args.out, args.replicas)
    n_small = spark.read.parquet(f"{args.src}/documents.parquet").count()
    n_big = spark.read.parquet(f"{big_dir}/documents.parquet").count()

    # warm codegen/scan paths once per scale so ratios compare steady-state
    time_queries(spark, args.src)
    small = time_queries(spark, args.src)
    time_queries(spark, big_dir)
    big = time_queries(spark, big_dir)

    ratios = {q: round(big[q] / max(small[q], 0.01), 2) for q in PROBE_QUERIES}
    print(json.dumps({"scale": "sf0.1", "n_docs": n_small, "sec": small}))
    print(json.dumps({"scale": f"{args.replicas}x", "n_docs": n_big, "sec": big}))
    print(
        json.dumps(
            {
                "ratios_wall_big_over_small": ratios,
                "linear_budget": round(args.replicas * SLACK, 1),
                "superlinear": [
                    q for q, r in ratios.items() if r > args.replicas * SLACK
                ],
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
