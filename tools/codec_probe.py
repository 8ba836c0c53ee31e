"""Parquet compression codec trade-off: storage bytes vs write CPU vs
scan wall — the other write-time layout lever next to file count
(tools/smallfiles_probe.py).

At 100 TB the codec choice is a standing cost on three axes at once:
object-store bytes (and the read bandwidth they imply), write-path CPU,
and scan-path decompress CPU. This probe writes the SAME ~1.4 GB
lineitem corpus (100x synth, reused) once per codec at a fixed 64-file
layout (the smallfiles probe's sweet spot, so codec is the only moving
part) and measures write wall, on-disk bytes, and min-of-2 warm
full-scan aggregate wall, with answer parity across codecs (counts
exact, sums 1e-9 relative).

Codecs: snappy (Spark's default), zstd, gzip, lz4, uncompressed.
All are in stock Spark 4; zstd level is left at Spark's default (3).

Usage: python tools/codec_probe.py [--src /root/testdata/sf0.1]
          [--out-root /tmp/scale_probe] [--codecs snappy,zstd,gzip,lz4,uncompressed]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _agg(spark, path: str):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out-root", default="/tmp/scale_probe")
    ap.add_argument(
        "--codecs", default="snappy,zstd,gzip,lz4,uncompressed"
    )
    args = ap.parse_args()
    codecs = args.codecs.split(",")

    from multiomix_aws_emr_spark.session import build_session
    from tools.scale_probe import synthesize

    spark = build_session(app_name="codec_probe")
    spark.sparkContext.setLogLevel("ERROR")

    rel_dir = synthesize(
        spark,
        "relational",
        args.src,
        os.path.join(args.out_root, "relational_100x"),
        100,
    )
    src_li = f"{rel_dir}/lineitem.parquet"
    root = os.path.join(args.out_root, "codecs")

    answers = {}
    base_bytes = None
    for codec in codecs:
        dst = os.path.join(root, codec)
        if not os.path.exists(dst):
            t0 = time.perf_counter()
            (
                spark.read.parquet(src_li)
                .repartition(64)
                .write.mode("overwrite")
                .option("compression", codec)
                .parquet(dst)
            )
            write_sec = round(time.perf_counter() - t0, 1)
        else:
            write_sec = None  # reused layout: write not re-measured
        size = _dir_bytes(dst)
        if base_bytes is None:
            base_bytes = size
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = _agg(spark, dst).collect()
            walls.append(time.perf_counter() - t0)
        answers[codec] = sorted((r.l_returnflag, r.n, r.revenue) for r in rows)
        print(
            json.dumps(
                {
                    "codec": codec,
                    "write_sec": write_sec,
                    "bytes": size,
                    "bytes_vs_first": round(size / base_bytes, 3),
                    "scan_cold_sec": round(walls[0], 2),
                    "scan_warm_sec": round(min(walls[1:]), 2),
                }
            ),
            flush=True,
        )

    base = answers[codecs[0]]
    parity = all(
        len(a) == len(base)
        and all(
            x[0] == y[0]
            and x[1] == y[1]
            and abs(x[2] - y[2]) <= 1e-9 * max(abs(y[2]), 1.0)
            for x, y in zip(a, base)
        )
        for a in answers.values()
    )
    print(json.dumps({"parity": parity}), flush=True)
    spark.stop()
    return 0 if parity else 1


if __name__ == "__main__":
    sys.exit(main())
