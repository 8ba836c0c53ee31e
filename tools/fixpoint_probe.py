"""Convergence probe for the two cut-fixpoint iterators (r15).

Both surgical cuts share the Lee et al. 2022 caveat: removing a span can
splice two clean fragments into a NEW duplicate (ExactSubstr) or
eval-matching (decontamination) gram. The fixpoint components iterate
detect+cut until zero spans; this probe runs both on the real fixture
corpus and reports per-round span/doc counts, total wall, and the
strict postcondition recomputed from the cleaned text (0 cross-doc
duplicate k-grams / 0 grams shared with the eval split) — the numbers
recorded in BASELINE.md.

Usage: python tools/fixpoint_probe.py [--src /root/testdata/sf0.1]
       [--k-sub 5] [--k-decon 8] [--window 5]
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
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--k-sub", type=int, default=5)
    ap.add_argument("--k-decon", type=int, default=8)
    ap.add_argument("--window", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.dedup import (
        decontaminate_cut_fixpoint,
        gram_rows,
        substring_cut_fixpoint,
    )
    from multiomix_aws_emr_spark.session import build_session

    spark = build_session(
        app_name="fixpoint_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{args.src}/documents.parquet").select(
        "doc_id", "text"
    )

    report: dict = {"probe": "cut_fixpoint", "src": args.src}

    t0 = time.perf_counter()
    cleaned, rounds = substring_cut_fixpoint(d, k=args.k_sub)
    residual = (
        gram_rows(cleaned, id_col="doc_id", text_col="text", k=args.k_sub)
        .groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter("nd >= 2")
        .count()
    )
    report["substring"] = {
        "k": args.k_sub,
        "rounds": rounds,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "cross_doc_dup_grams_after": residual,
    }

    ev = d.filter("doc_id % 20 = 0")
    tr = d.filter("doc_id % 20 != 0")
    t0 = time.perf_counter()
    cleaned, rounds = decontaminate_cut_fixpoint(
        tr, ev, k=args.k_decon, window=args.window
    )
    ev_grams = (
        gram_rows(ev, id_col="doc_id", text_col="text", k=args.k_decon)
        .select("gram")
        .distinct()
    )
    leaked = (
        gram_rows(cleaned, id_col="doc_id", text_col="text", k=args.k_decon)
        .join(ev_grams, "gram", "left_semi")
        .count()
    )
    report["decontaminate"] = {
        "k": args.k_decon,
        "window": args.window,
        "rounds": rounds,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "leaked_grams_after": leaked,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
