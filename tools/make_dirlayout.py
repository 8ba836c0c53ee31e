"""Materialize a directory-layout copy of a fixture sf dir.

The driver fixtures ship each table as a single parquet FILE; every real
parquet writer (and every object store) produces a DIRECTORY of part
files. The round-5 sweep found two real defects only visible under the
directory layout (multi-batch streaming emission, partition-sensitive
k-means init — BASELINE.md §C), so the sweep is re-run each round after
plan edits:

  python tools/make_dirlayout.py [--src /root/testdata/sf0.01] \
      [--dst /tmp/dirlayout/sf0.01] [--parts 4]
  SPARK_GRAFT_TESTDATA=/tmp/dirlayout SPARK_GRAFT_PARITY_SF=sf0.01 \
      python -m pytest tests/test_oracle_parity.py -q

Tables copy as ``--parts`` part files each; ``events`` is range-split on
``ts`` with part mtimes stamped ascending, because FileStreamSource
replays files in mtime order — a randomly-split events directory would
feed mostly-late rows to later micro-batches and the watermark would
(correctly) drop them, turning a layout artifact into result skew.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dirlayout(spark, src: str, dst: str, parts: int) -> None:
    from multiomix_aws_emr_spark.sources.tables import TABLE_NAMES, load

    os.makedirs(dst, exist_ok=True)
    for name in TABLE_NAMES:
        out = os.path.join(dst, f"{name}.parquet")
        if os.path.exists(out):
            continue
        df = load(spark, src, name)
        if name == "events":
            df.repartitionByRange(parts, "ts").write.mode("overwrite").parquet(out)
            files = sorted(
                f for f in os.listdir(out) if f.endswith(".parquet")
            )
            base = time.time() - len(files)
            for i, f in enumerate(files):
                os.utime(os.path.join(out, f), (base + i, base + i))
        else:
            df.repartition(parts).write.mode("overwrite").parquet(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--dst", default="/tmp/dirlayout/sf0.01")
    ap.add_argument("--parts", type=int, default=4)
    args = ap.parse_args()
    if args.parts < 1:
        ap.error("--parts must be >= 1")

    from multiomix_aws_emr_spark.session import build_session

    spark = build_session(app_name="make_dirlayout")
    spark.sparkContext.setLogLevel("ERROR")
    make_dirlayout(spark, args.src, args.dst, args.parts)
    spark.stop()
    print(f"dirlayout ready: {args.dst} ({args.parts} parts/table)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
