"""Transactional-ingest probe: what does the manifest-committed dedup
store (operators/ingest.py) cost per ingest versus a bare incremental
ingest that persists the same primary artifacts without the transaction?

On the 1000x documents synth (~5M docs), one batch ingest each way:

  bare — the r11-style incremental path, persisted but NOT transactional:
         banded(new) [persisted in memory], incremental_assign -> parquet,
         upsert_band_index -> overwrite the index parquet in place. No
         membership table, no staging, no manifest; a crash mid-way
         leaves assignments/index inconsistent and a concurrent writer
         can silently lose buckets.
  txn  — operators/ingest.ingest_batch: stage the batch sketch ONCE to
         parquet (both consumers re-read it), write assignments, write
         writer-unique index AND membership versions, atomic manifest
         publish. Crash-convergent, replay-idempotent, loud on races,
         retraction-capable (the membership write is retraction's cost).

Parity is asserted on the assignment checksum. Note both paths rewrite
the full index per ingest (immutable version vs in-place overwrite —
same O(index) bytes); at warehouse scale a MERGE into a bucketed table
touches only changed buckets, shrinking BOTH. The txn-only extra bytes
are the staged batch sketch and the membership version.

Usage: python tools/ingest_txn_probe.py [--big-dir ...] [--split-mod 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _synth_if_missing(spark, big_dir: str) -> None:
    """Materialize the 1000x documents synth via tools/scale_probe's
    synthesizer when the dir is absent (a fresh /tmp)."""
    if os.path.isdir(big_dir):
        return
    import importlib.util

    sp = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_probe.py")
    spec = importlib.util.spec_from_file_location("scale_probe", sp)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.synthesize(spark, "documents", "/root/testdata/sf0.1", big_dir, 1000)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big-dir", default="/tmp/scale_probe/documents_1000x")
    ap.add_argument("--split-mod", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.dedup import (
        band_index,
        banded_buckets,
        incremental_assign,
        upsert_band_index,
    )
    from multiomix_aws_emr_spark.operators.ingest import (
        ingest_batch,
        read_assignments,
    )
    from multiomix_aws_emr_spark.session import build_session
    from multiomix_aws_emr_spark.sources.tables import load

    spark = build_session(app_name="ingest-txn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    _synth_if_missing(spark, args.big_dir)

    docs = load(spark, args.big_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    old = docs.filter(F.col("doc_id") % args.split_mod != 0)
    new = docs.filter(F.col("doc_id") % args.split_mod == 0)

    def _banded(df):
        # production xxhash64 path, same as incremental_dedup_probe
        return banded_buckets(df, text_col="text", id_col="doc_id")

    def _checksum(assign_df):
        r = assign_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_id", "rep_id").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return r.n, r.h

    scratch = tempfile.mkdtemp(prefix="ingest_txn_probe_")
    try:
        # ---- history: one committed store + one bare index, same content
        store_root = os.path.join(scratch, "store")
        t0 = time.perf_counter()
        ingest_batch(
            spark, store_root, old, batch_id="history", portable=False
        )
        t_store_history = time.perf_counter() - t0

        bare_index_path = os.path.join(scratch, "bare_index")
        t0 = time.perf_counter()
        band_index(_banded(old), id_col="doc_id").write.parquet(bare_index_path)
        t_bare_history = time.perf_counter() - t0

        # ---- bare per-ingest: persist assignments + overwrite index
        t0 = time.perf_counter()
        index = spark.read.parquet(bare_index_path)
        nb = _banded(new).persist()
        assign_path = os.path.join(scratch, "bare_assignments")
        incremental_assign(nb, index, id_col="doc_id").write.parquet(assign_path)
        next_index = os.path.join(scratch, "bare_index_next")
        upsert_band_index(index, nb, id_col="doc_id").write.parquet(next_index)
        nb.unpersist()
        t_bare = time.perf_counter() - t0
        bare_n, bare_h = _checksum(spark.read.parquet(assign_path))

        # ---- transactional per-ingest: the full atomic composition
        t0 = time.perf_counter()
        ingest_batch(spark, store_root, new, batch_id="b1", portable=False)
        t_txn = time.perf_counter() - t0
        txn_n, txn_h = _checksum(read_assignments(spark, store_root, "b1"))

        # ---- retraction: forget 1000 docs (worst case: every one a rep)
        from multiomix_aws_emr_spark.operators.ingest import (
            read_index,
            read_membership,
            retract_batch,
        )

        victims = (
            read_index(spark, store_root)
            .select(F.col("rep").alias("doc_id"))
            .distinct()
            .limit(1000)
        )
        n_victims = victims.count()
        t0 = time.perf_counter()
        retract_batch(spark, store_root, victims, op_id="retract-probe")
        t_retract = time.perf_counter() - t0
        survived = read_membership(spark, store_root).join(
            victims, "doc_id", "left_semi"
        )
        assert survived.count() == 0, "retracted ids still in membership"

        # ---- time travel + version diff + vacuum (r12): the chain is now
        # v1 history, v2 ingest, v3 retraction — snapshot reads and the
        # changelog are manifest lookups + compact-table scans/joins,
        # never corpus text.
        from multiomix_aws_emr_spark.operators.ingest import (
            diff_versions,
            sweep_orphans,
        )

        t0 = time.perf_counter()
        tt_rows = read_index(spark, store_root, version=1).count()
        t_timetravel = time.perf_counter() - t0
        assert tt_rows == spark.read.parquet(bare_index_path).count(), (
            "as-of-v1 snapshot != the history index"
        )
        t0 = time.perf_counter()
        diff_rows = diff_versions(spark, store_root, 2, 3).count()
        t_diff = time.perf_counter() - t0
        assert diff_rows >= n_victims, "retraction changelog too small"
        t0 = time.perf_counter()
        swept = sweep_orphans(store_root, retain_versions=1)
        t_vacuum = time.perf_counter() - t0
        assert read_index(spark, store_root, version=2).count() > 0
        try:
            read_index(spark, store_root, version=1)
            raise AssertionError("vacuumed v1 still readable")
        except ValueError:
            pass

        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "split_mod": args.split_mod,
                    "n_batch": txn_n,
                    "parity": bool(txn_n == bare_n and txn_h == bare_h),
                    "history_store_sec": round(t_store_history, 2),
                    "history_bare_sec": round(t_bare_history, 2),
                    "bare_ingest_sec": round(t_bare, 2),
                    "txn_ingest_sec": round(t_txn, 2),
                    "txn_overhead": round(t_txn / max(t_bare, 0.01), 2),
                    "n_retracted_reps": n_victims,
                    "retract_txn_sec": round(t_retract, 2),
                    "timetravel_v1_rows": tt_rows,
                    "timetravel_read_sec": round(t_timetravel, 2),
                    "diff_v2_v3_rows": diff_rows,
                    "diff_sec": round(t_diff, 2),
                    "vacuum_swept_dirs": len(swept),
                    "vacuum_sec": round(t_vacuum, 2),
                }
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
