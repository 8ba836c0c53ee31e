"""PQ A/B probe (VERDICT r13 tasks 3 + 5): at synthetic scale, measure

1. **Residual vs raw-vector PQ recall** — encode the same corpus both
   ways (identical code budget) and compare recall@5 of the composed
   IVF-PQ search (probe -> per-cell-LUT ADC shortlist -> exact refine)
   against brute-force ground truth, over a panel of query vectors.
   The corpus is CLUSTERED (planted Gaussian blobs, unlike the
   isotropic fixture) so the coarse quantizer has real structure to
   exploit — the regime where residual encoding earns its keep: once a
   cell is known, the raw-vector code wastes bits re-describing the
   cell's center while the residual code spends them on the remainder.

2. **int64-packed vs string codes** — pq_pack_codes at n_sub=8/bits=4:
   parquet bytes of the codes column stored both ways at 2M vectors,
   plus the pack projection's wall (map-only, built-ins) — the
   "production form is truly 8 bytes/vector" claim, measured.

Synth: deterministic JVM-side expressions (sin-hash blobs), no RNG
state on the driver, no fixture dependence. Results recorded in
BASELINE.md §PQ.

Usage: python tools/pq_recall_probe.py [--n 100000] [--dim 64]
       [--cells 64] [--pack-n 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_blobs(spark, n: int, dim: int, blobs: int):
    """n vectors in `blobs` planted clusters: center(blob) + small
    deterministic jitter, all JVM-side expressions."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("vec_id"))
    blob = F.pmod(F.col("vec_id"), F.lit(blobs))
    emb = F.array(
        *[
            (
                F.sin((blob + F.lit(7919 * d)) * F.lit(2.399963))  # center
                + F.sin(
                    (F.col("vec_id") + F.lit(104729 * d)) * F.lit(0.618034)
                )
                * F.lit(0.15)  # jitter
            )
            for d in range(dim)
        ]
    )
    return base.select("vec_id", emb.alias("emb"))


def synth_uniform(spark, n: int, dim: int):
    """n diverse vectors: each coordinate a deterministic xxhash64-derived
    uniform in [-1, 1) — code strings are near-unique, the worst case for
    columnar encodings of the codes column (what a real embedding corpus
    looks like to parquet)."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("vec_id"))
    emb = F.array(
        *[
            (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), F.lit(d)), F.lit(100_000)
                )
                / F.lit(50_000.0)
                - F.lit(1.0)
            )
            for d in range(dim)
        ]
    )
    return base.select("vec_id", emb.alias("emb"))


def recall_ab(spark, n: int, dim: int, cells: int, n_sub: int, queries: int):
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.similarity import (
        assign_to_centroids,
        centroid_matrix,
        exact_topk,
        hash_group_centroids,
        ivfpq_topk,
        pq_encode,
        pq_encode_residual,
        pq_train_codebooks_kmeans,
    )

    e = synth_blobs(spark, n, dim, blobs=cells * 4).cache()
    e.count()
    # sample coarse quantizer: `cells` spread-out ids (one per blob run)
    cent_rows = (
        e.filter(F.pmod(F.col("vec_id"), F.lit(n // cells)) == 0)
        .orderBy("vec_id")
        .limit(cells)
        .collect()
    )
    cmat = np.array([r.emb for r in cent_rows], dtype=np.float64)
    assigned = assign_to_centroids(
        e, cmat, id_col="vec_id", vec_col="emb"
    ).select("vec_id", "list_id")
    m = assigned.join(e, "vec_id")
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in cmat[i]]) for i in range(len(cmat))],
        "list_id int, cent array<double>",
    )
    res = m.join(F.broadcast(cdf), "list_id").select(
        "vec_id",
        "list_id",
        "emb",
        F.zip_with("emb", "cent", lambda x, y: x - y).alias("res"),
    )
    res = res.persist()
    pmat_res = centroid_matrix(
        hash_group_centroids(
            res, id_col="vec_id", vec_col="res", n_lists=16
        ).collect()
    )
    pmat_raw = centroid_matrix(
        hash_group_centroids(
            e, id_col="vec_id", vec_col="emb", n_lists=16
        ).collect()
    )
    # r15 (VERDICT r14 task 4): TRAINED per-subspace k-means codebooks
    # over the same residual frame — the production quantizer swap
    t0 = time.perf_counter()
    pmat_km = pq_train_codebooks_kmeans(
        res, vec_col="res", n_sub=n_sub, k=16, seed=42
    )
    train_km_wall = round(time.perf_counter() - t0, 2)
    # FAISS-style sampled training: codebooks saturate at ~1e5 vectors.
    # At n <= 100k the fraction is 1.0 — no sampling would occur, so the
    # arm is skipped rather than recording a no-op A/B that reads as
    # "sampling loses zero recall" (code-review r15)
    frac = 100_000 / max(n, 1)
    pmat_km_s = None
    train_km_sampled_wall = None
    if frac < 1.0:
        t0 = time.perf_counter()
        pmat_km_s = pq_train_codebooks_kmeans(
            res, vec_col="res", n_sub=n_sub, k=16, seed=42,
            sample_fraction=frac,
        )
        train_km_sampled_wall = round(time.perf_counter() - t0, 2)
    enc_res = pq_encode_residual(
        res, cmat, pmat_res,
        id_col="vec_id", vec_col="emb", cell_col="list_id", n_sub=n_sub,
    ).cache()
    enc_km = pq_encode_residual(
        res, cmat, pmat_km,
        id_col="vec_id", vec_col="emb", cell_col="list_id", n_sub=n_sub,
    ).cache()
    enc_km_s = None
    if pmat_km_s is not None:
        enc_km_s = pq_encode_residual(
            res, cmat, pmat_km_s,
            id_col="vec_id", vec_col="emb", cell_col="list_id", n_sub=n_sub,
        ).cache()
    enc_raw = (
        pq_encode(m, pmat_raw, id_col="vec_id", vec_col="emb", n_sub=n_sub)
        .join(assigned, "vec_id")
        .select("vec_id", "list_id", "codes")
        .cache()
    )
    for frame in (enc_res, enc_km, enc_km_s, enc_raw):
        if frame is not None:
            frame.count()

    qids = [int(i * (n // queries) + 17) for i in range(queries)]
    qvecs = {
        r.vec_id: r.emb for r in e.filter(F.col("vec_id").isin(qids)).collect()
    }
    exact = exact_topk(
        e, id_col="vec_id", vec_col="emb", query_ids=qids, k=5
    )
    exact_map: dict = {}
    for r in exact.collect():
        exact_map.setdefault(r.query_id, set()).add(r.id_b)

    out = {
        "kmeans_train_wall_sec": train_km_wall,
        "kmeans_sampled_train_wall_sec": train_km_sampled_wall,
        "kmeans_sample_fraction": round(frac, 4) if frac < 1.0 else None,
    }
    arms = [
        ("residual", enc_res, pmat_res, True),
        ("residual_kmeans", enc_km, pmat_km, True),
        ("raw", enc_raw, pmat_raw, False),
    ]
    if enc_km_s is not None:
        arms.insert(2, ("residual_kmeans_sampled", enc_km_s, pmat_km_s, True))
    for name, enc, pmat, residual in arms:
        t0 = time.perf_counter()
        hits = tot = 0
        for qid in qids:
            short = ivfpq_topk(
                enc.filter(F.col("vec_id") != qid),
                cmat,
                pmat,
                qvecs[qid],
                id_col="vec_id",
                n_sub=n_sub,
                k=192,
                n_probe=max(2, cells // 8),
                residual=residual,
            ).select("vec_id")
            cand = e.join(short, "vec_id", "left_semi").collect()
            q = np.array(qvecs[qid])
            qn = np.sqrt((q * q).sum())
            sims = sorted(
                (
                    (
                        -float(
                            np.dot(r.emb, q)
                            / (np.sqrt(np.dot(r.emb, r.emb)) * qn)
                        ),
                        r.vec_id,
                    )
                    for r in cand
                ),
            )[:5]
            got = {vid for _, vid in sims}
            hits += len(got & exact_map[qid])
            tot += len(exact_map[qid])
        out[name] = {
            "recall_at_5": round(hits / tot, 4),
            "search_wall_sec": round(time.perf_counter() - t0, 2),
        }
    for frame in (e, res, enc_res, enc_km, enc_km_s, enc_raw):
        if frame is not None:
            frame.unpersist()
    return out


def pack_ab(spark, n: int, dim: int, tmp: str):
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.similarity import (
        centroid_matrix,
        hash_group_centroids,
        pq_encode,
        pq_pack_codes,
    )

    # hash-uniform vectors: the sin-lattice blob synth is periodic and
    # quantizes to only ~300 distinct code strings at 200k vectors, so
    # parquet dictionary-encodes BOTH forms to ~nothing and hides the
    # width difference a real (diverse-code) corpus shows
    e = synth_uniform(spark, n, dim)
    pmat = centroid_matrix(
        hash_group_centroids(
            e, id_col="vec_id", vec_col="emb", n_lists=16
        ).collect()
    )
    codes = pq_encode(e, pmat, id_col="vec_id", vec_col="emb", n_sub=8).cache()
    t0 = time.perf_counter()
    codes.count()
    encode_wall = round(time.perf_counter() - t0, 2)

    str_path = os.path.join(tmp, "codes_str")
    t0 = time.perf_counter()
    codes.write.mode("overwrite").parquet(str_path)
    str_wall = round(time.perf_counter() - t0, 2)

    packed = pq_pack_codes(codes, n_sub=8, bits=4).select(
        "vec_id", "codes_packed"
    )
    int_path = os.path.join(tmp, "codes_packed")
    t0 = time.perf_counter()
    packed.write.mode("overwrite").parquet(int_path)
    pack_wall = round(time.perf_counter() - t0, 2)
    codes.unpersist()

    def du(path):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )

    return {
        "n": n,
        "encode_wall_sec": encode_wall,
        "string_codes_parquet_bytes": du(str_path),
        "packed_codes_parquet_bytes": du(int_path),
        "string_write_wall_sec": str_wall,
        "packed_write_wall_sec": pack_wall,
        "float32_equiv_bytes": n * dim * 4,
    }


def adc_ab(spark, n: int, dim: int, tmp: str, rounds: int = 3):
    """Scoring-path A/B at corpus scale (r14): full-scan ADC top-10 over
    the SAME codes, stored and scored two ways — (a) string codes +
    Arrow-UDF LUT indexing (pq_adc_topk), (b) int64-packed codes +
    whole-stage-codegen shift/mask/element_at (pq_adc_topk_packed). Both
    read from parquet on disk, so the measured delta is the real scan
    shape: bytes read + Python boundary vs none. min-over-rounds."""
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.similarity import (
        centroid_matrix,
        hash_group_centroids,
        pq_adc_topk,
        pq_adc_topk_packed,
        pq_encode,
        pq_pack_codes,
    )

    e = synth_uniform(spark, n, dim)
    pmat = centroid_matrix(
        hash_group_centroids(
            e, id_col="vec_id", vec_col="emb", n_lists=16
        ).collect()
    )
    codes = pq_encode(e, pmat, id_col="vec_id", vec_col="emb", n_sub=8)
    both = pq_pack_codes(codes, n_sub=8, bits=4)
    str_path = os.path.join(tmp, "adc_str")
    int_path = os.path.join(tmp, "adc_packed")
    both.select("vec_id", "codes").write.mode("overwrite").parquet(str_path)
    both.select("vec_id", "codes_packed").write.mode("overwrite").parquet(
        int_path
    )
    q = [r.emb for r in e.filter("vec_id = 0").collect()][0]
    str_df = spark.read.parquet(str_path)
    int_df = spark.read.parquet(int_path)

    walls = {"string_arrow": [], "packed_codegen": []}
    results = {}
    for _ in range(rounds):
        t0 = time.perf_counter()
        results["string_arrow"] = [
            (r.vec_id, r.adc_dist2)
            for r in pq_adc_topk(
                str_df, pmat, q, id_col="vec_id", n_sub=8, k=10
            ).collect()
        ]
        walls["string_arrow"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        results["packed_codegen"] = [
            (r.vec_id, r.adc_dist2)
            for r in pq_adc_topk_packed(
                int_df, pmat, q, id_col="vec_id", n_sub=8, bits=4, k=10
            ).collect()
        ]
        walls["packed_codegen"].append(time.perf_counter() - t0)

    same_ids = [x[0] for x in results["string_arrow"]] == [
        x[0] for x in results["packed_codegen"]
    ]
    s = min(walls["string_arrow"])
    p = min(walls["packed_codegen"])
    return {
        "n": n,
        "rounds": rounds,
        "string_arrow_scan_sec": round(s, 2),
        "packed_codegen_scan_sec": round(p, 2),
        "speedup": round(s / p, 2),
        "topk_ids_identical": same_ids,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cells", type=int, default=64)
    ap.add_argument("--n-sub", type=int, default=16)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--pack-n", type=int, default=2_000_000)
    ap.add_argument("--skip-recall", action="store_true")
    ap.add_argument("--skip-pack", action="store_true")
    ap.add_argument("--adc-ab", action="store_true")
    ap.add_argument("--adc-n", type=int, default=2_000_000)
    args = ap.parse_args()

    from multiomix_aws_emr_spark.session import build_session

    spark = build_session()
    import tempfile

    report: dict = {"probe": "pq_recall_pack_ab"}
    if not args.skip_recall:
        report["recall_ab"] = recall_ab(
            spark, args.n, args.dim, args.cells, args.n_sub, args.queries
        )
    if not args.skip_pack:
        with tempfile.TemporaryDirectory(prefix="pq_pack_") as tmp:
            report["pack_ab"] = pack_ab(spark, args.pack_n, args.dim, tmp)
    if args.adc_ab:
        with tempfile.TemporaryDirectory(prefix="pq_adc_") as tmp:
            report["adc_ab"] = adc_ab(spark, args.adc_n, args.dim, tmp)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
