"""IVF incremental-ingest probe: what does the persisted-quantizer ANN
path (plans/sketchcache.ivf_centroid_index + operators/similarity.
assign_to_centroids) cost at volume, versus re-deriving the quantizer
per batch the way a non-incremental pipeline would?

On the 1000x embeddings synth (~2M x 64-dim vectors, sign-flip replicas
so per-copy geometry is preserved — tools/scale_probe.py):

  train  — ONE-TIME: hash-group centroids over the 75% history slice,
           written to parquet (amortized across every future ingest; the
           kmeans_centroids production path costs more to train but has
           the identical downstream shape).
  assign — PER-BATCH: quantize the 25% incoming batch against the
           persisted centroids — one map-only Arrow pandas-UDF pass
           (BLAS matmul per batch; no join, no shuffle, no history read).
  rebuild— what a naive pipeline pays instead: re-train over old∪new,
           then assign — the denominator of the incremental win.

Correctness in-probe: per-list counts conserve the batch, and a 1k-row
driver sample is re-quantized in NumPy and compared exactly.

Usage: python tools/ivf_incremental_probe.py [--big-dir ...] [--replicas 1000]
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


def _synth_if_missing(spark, big_dir: str, replicas: int) -> None:
    if os.path.isdir(big_dir):
        return
    import importlib.util

    sp = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_probe.py")
    spec = importlib.util.spec_from_file_location("scale_probe", sp)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.synthesize(spark, "embeddings", "/root/testdata/sf0.1", big_dir, replicas)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big-dir", default="/tmp/scale_probe/embeddings_1000x")
    ap.add_argument("--replicas", type=int, default=1000)
    ap.add_argument("--n-lists", type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.similarity import (
        assign_to_centroids,
        hash_group_centroids,
    )
    from multiomix_aws_emr_spark.session import build_session
    from multiomix_aws_emr_spark.sources.tables import load

    spark = build_session(app_name="ivf-incremental-probe")
    spark.sparkContext.setLogLevel("ERROR")
    _synth_if_missing(spark, args.big_dir, args.replicas)

    emb = load(spark, args.big_dir, "embeddings").select("vec_id", "embedding")
    n_vecs = emb.count()
    hist = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    grp = F.pmod(F.shiftright(F.col("vec_id"), 2), F.lit(args.n_lists))

    scratch = tempfile.mkdtemp(prefix="ivf_probe_")
    try:
        # ---- one-time quantizer train + persist
        t0 = time.perf_counter()
        cpath = os.path.join(scratch, "centroids")
        hash_group_centroids(
            hist, id_col="vec_id", vec_col="embedding",
            n_lists=args.n_lists, group_expr=grp,
        ).write.parquet(cpath)
        t_train = time.perf_counter() - t0

        rows = sorted(
            spark.read.parquet(cpath).collect(), key=lambda r: r.list_id
        )
        assert [r.list_id for r in rows] == list(range(args.n_lists))
        cmat = np.array([r.cent for r in rows], dtype=np.float64)

        # ---- per-batch incremental assign (forced end-to-end via noop sink)
        assigned = assign_to_centroids(
            batch, cmat, id_col="vec_id", vec_col="embedding"
        )
        t0 = time.perf_counter()
        assigned.write.format("noop").mode("overwrite").save()
        t_assign_cold = time.perf_counter() - t0  # incl. Python worker spawn
        t0 = time.perf_counter()
        assigned.write.format("noop").mode("overwrite").save()
        t_assign = time.perf_counter() - t0  # steady state (workers reused)
        n_batch = batch.count()

        # conservation + spot check
        counts = dict(
            assigned.groupBy("list_id").count().rdd.map(tuple).collect()
        )
        assert sum(counts.values()) == n_batch, (counts, n_batch)
        sample = assigned.limit(1000).collect()
        svecs = {
            r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in batch.join(
                spark.createDataFrame(
                    [(r.vec_id,) for r in sample], "vec_id BIGINT"
                ),
                "vec_id",
                "left_semi",
            ).collect()
        }
        for r in sample:
            d2 = ((svecs[r.vec_id][None, :] - cmat) ** 2).sum(axis=1)
            assert r.list_id == int(d2.argmin()), r

        # ---- the naive per-batch cost: re-train over old ∪ new, then assign
        t0 = time.perf_counter()
        rpath = os.path.join(scratch, "centroids_rebuild")
        hash_group_centroids(
            emb, id_col="vec_id", vec_col="embedding",
            n_lists=args.n_lists, group_expr=grp,
        ).write.parquet(rpath)
        rrows = sorted(
            spark.read.parquet(rpath).collect(), key=lambda r: r.list_id
        )
        rmat = np.array([r.cent for r in rrows], dtype=np.float64)
        assign_to_centroids(
            batch, rmat, id_col="vec_id", vec_col="embedding"
        ).write.format("noop").mode("overwrite").save()
        t_rebuild = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "n_vecs": n_vecs,
                    "n_batch": n_batch,
                    "n_lists": args.n_lists,
                    "train_once_sec": round(t_train, 2),
                    "assign_cold_sec": round(t_assign_cold, 2),
                    "assign_sec": round(t_assign, 2),
                    "assign_vecs_per_sec": int(n_batch / max(t_assign, 1e-9)),
                    "rebuild_then_assign_sec": round(t_rebuild, 2),
                    "incremental_speedup": round(t_rebuild / max(t_assign, 1e-9), 2),
                }
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
