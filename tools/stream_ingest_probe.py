"""Streaming-ingest throughput probe: what does CONTINUOUS transactional
arrival cost versus landing the same corpus as one batch ingest?

On the 1000x documents synth (~5M docs, 32 part files) the corpus is
streamed as ``ceil(32 / files_per_trigger)`` micro-batches, each one an
atomic store commit (streaming/ingest.py), against a one-shot
``ingest_batch`` of everything into a fresh store. Parity is asserted on
the final index (both must equal the from-scratch build, and therefore
each other): streaming arrival changes pacing and durability points,
never the dedup result.

The expected gap is the per-commit fixed cost x batch count — each
micro-batch rewrites the full index version (the immutable-version
design; a warehouse MERGE shrinks it) and pays one manifest fsync.
Divide the gap by the batch count for the marginal cost of a commit
point, i.e. what buying a durability/exactly-once boundary every N docs
costs at this scale.

Usage: python tools/stream_ingest_probe.py [--big-dir ...]
       [--files-per-trigger 4]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big-dir", default="/tmp/scale_probe/documents_1000x")
    ap.add_argument("--files-per-trigger", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.dedup import band_index, banded_buckets
    from multiomix_aws_emr_spark.operators.ingest import (
        ingest_batch,
        latest_manifest,
        read_index,
    )
    from multiomix_aws_emr_spark.session import build_session
    from multiomix_aws_emr_spark.sources.tables import load
    from multiomix_aws_emr_spark.streaming.ingest import run_stream_ingest

    spark = build_session(app_name="stream-ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, args.big_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    src = os.path.join(args.big_dir, "documents.parquet")

    def _index_checksum(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("band", "bucket", "rep").cast("decimal(38,0)")).alias(
                "h"
            ),
        ).collect()[0]
        return r.n, r.h

    scratch = tempfile.mkdtemp(prefix="stream_ingest_probe_")
    try:
        # one-shot batch ingest of the full corpus
        batch_root = os.path.join(scratch, "batch_store")
        t0 = time.perf_counter()
        ingest_batch(spark, batch_root, docs, batch_id="all", portable=False)
        t_batch = time.perf_counter() - t0
        batch_ck = _index_checksum(read_index(spark, batch_root))

        # streamed arrival, files_per_trigger parts per micro-batch
        stream_root = os.path.join(scratch, "stream_store")
        static = spark.read.parquet(src)
        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", str(args.files_per_trigger))
            .parquet(src)
        )
        t0 = time.perf_counter()
        run_stream_ingest(
            spark, stream_root, stream,
            id_col="doc_id", text_col="text", portable=False,
        )
        t_stream = time.perf_counter() - t0
        ver, _m = latest_manifest(stream_root)
        stream_ck = _index_checksum(read_index(spark, stream_root))

        rebuild_ck = _index_checksum(
            band_index(
                banded_buckets(docs, text_col="text", id_col="doc_id"),
                id_col="doc_id",
            )
        )
        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "micro_batches": ver,
                    "parity": bool(
                        batch_ck == stream_ck == rebuild_ck
                    ),
                    "batch_oneshot_sec": round(t_batch, 2),
                    "stream_total_sec": round(t_stream, 2),
                    "stream_docs_per_sec": int(n_docs / max(t_stream, 0.01)),
                    "marginal_commit_sec": round(
                        (t_stream - t_batch) / max(ver - 1, 1), 2
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
