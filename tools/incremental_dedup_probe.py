"""Incremental-dedup probe: is assigning a new ingest batch against the
persisted band index actually cheaper than re-deduplicating the corpus?

On the 1000x documents synth (tools/scale_probe.py, ~5M docs):

  index build   — band_index over the historical slice (doc_id % 4 != 0),
                  written to parquet: the ONE-TIME cost a rolling corpus
                  pays once, amortized across every later ingest
  incremental   — incremental_assign(new batch sketch, index): the
                  PER-INGEST cost (reads index parquet + batch only)
  full redo     — lsh_cluster_assign over the banded sketch of old∪new,
                  restricted to the batch: what a non-incremental engine
                  pays per ingest (re-shingles all of history)

Parity is asserted on the assignment checksum, then walls are reported.
Production path (portable=False, xxhash64) — the fixture query's
portable md5 family exists for the DuckDB oracle only.

Usage: python tools/incremental_dedup_probe.py [--big-dir /tmp/scale_probe/documents_1000x]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big-dir", default="/tmp/scale_probe/documents_1000x")
    ap.add_argument(
        "--split-mod", type=int, default=4,
        help="batch = doc_id %% MOD == 0 (4 -> 25%% ingest, 100 -> 1%%: "
        "the incremental wall should scale with the batch, the full "
        "recompute with the corpus)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.dedup import (
        band_index,
        banded_buckets,
        incremental_assign,
        lsh_cluster_assign,
    )
    from multiomix_aws_emr_spark.session import build_session
    from multiomix_aws_emr_spark.sources.tables import load

    spark = build_session(app_name="incremental-dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, args.big_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    old = docs.filter(F.col("doc_id") % args.split_mod != 0)
    new = docs.filter(F.col("doc_id") % args.split_mod == 0)

    def _banded(df):
        return banded_buckets(df, text_col="text", id_col="doc_id")

    t0 = time.perf_counter()
    idx_path = tempfile.mkdtemp(prefix="inc_probe_index_")
    band_index(_banded(old), id_col="doc_id").write.mode("overwrite").parquet(
        idx_path
    )
    t_index = time.perf_counter() - t0
    index = spark.read.parquet(idx_path)

    def _checksum(assign_df):
        r = assign_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_id", "rep_id").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return r.n, r.h

    t0 = time.perf_counter()
    inc_n, inc_h = _checksum(incremental_assign(_banded(new), index, id_col="doc_id"))
    t_inc = time.perf_counter() - t0

    t0 = time.perf_counter()
    full = lsh_cluster_assign(_banded(docs), id_col="doc_id").filter(
        F.col("doc_id") % args.split_mod == 0
    )
    full_n, full_h = _checksum(full)
    t_full = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "split_mod": args.split_mod,
                "n_batch": inc_n,
                "parity": bool(inc_n == full_n and inc_h == full_h),
                "index_build_once_sec": round(t_index, 2),
                "incremental_per_ingest_sec": round(t_inc, 2),
                "full_recompute_per_ingest_sec": round(t_full, 2),
                "speedup_per_ingest": round(t_full / max(t_inc, 0.01), 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
