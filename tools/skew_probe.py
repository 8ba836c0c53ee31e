"""Skew-mitigation probe: measure straggler cost and its two cures.

SURVEY §6's skew claims (AQE skew-join splitting, explicit salting via
operators/skew.salted_join) are plan-asserted in tests/test_plans.py but
were never MEASURED under actual skew. This probe synthesizes a
deterministically skewed join input at 100x sf0.1 volume and times the
same shuffled hash/sort-merge join three ways:

  smj_skew_off   plain shuffle join, AQE skew splitting DISABLED — the
                 straggler baseline: every hot-key row lands in ONE task.
  smj_skew_on    same join, AQE skew splitting ENABLED (the engine's
                 default conf baseline) — oversized partitions split at
                 runtime.
  salted_32      operators/skew.salted_join with n_salts=32, AQE skew
                 splitting disabled — the explicit rewrite for paths AQE
                 can't touch; hot-key rows spread over 32 tasks.

Skew synthesis (deterministic, no RNG): starting from the key-shifted
100x relational corpus (tools/scale_probe.py — reused if already
materialized), ~30 % of lineitem rows are redirected to ONE hot order
key (md5(l_orderkey # l_linenumber) first byte < 0x4d), giving a ~18M-row
hot key against a 60M-row probe side. The build side is one replica's
orders (~150k rows) — small, but auto-broadcast is disabled for all three
strategies to model the broadcast-INELIGIBLE build the salting docstring
targets (at 100 TB the build side that skews you is the one too big to
broadcast).

All three strategies compute the same aggregate (match count + revenue
sum) over the same materialized parquet; the probe checks they agree
(counts exactly; the revenue double to 1e-6 relative — 60M-term float
sums legitimately differ in the last digits across summation orders) and
prints per-strategy wall seconds. Exits non-zero if the unmitigated
straggler is NOT the slowest — i.e. if the mitigations stopped paying for
themselves.

The skew thresholds are right-sized for the probe volume
(skewedPartitionThresholdInBytes=64MB, advisoryPartitionSizeInBytes=16MB):
the stock 256MB threshold targets clusters with 128MB-advisory
partitions, and the hot partition's COMPRESSED shuffle bytes (~200MB for
18M rows of three numeric columns) sit just under it — measured here:
with stock thresholds AQE never classifies the partition as skewed and
the "mitigated" run IS the straggler run. At 100 TB the same hot key
would be hundreds of GB and trip any threshold; on a right-sized probe
the split triggers exactly as it would there (47 join tasks vs 32 — the
hot partition splits ~16 ways).

`--mode agg` measures the CONTRAST claim: aggregation skew, unlike join
skew, needs NO mitigation — hash aggregation partial-aggregates map-side,
so a hot key collapses to one partial row per task before the shuffle.
Measured: groupBy(l_orderkey) over the skewed table (18M-row hot key) is
no slower than over the uniform table at identical volume (5.1 s vs
5.3 s — the hot key collapses to 32 partial rows before the shuffle).

Usage:  python tools/skew_probe.py [--mode join|agg] [--replicas 100]
        [--hot-hex 4d]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_skewed(spark, src_dir: str, out_root: str, replicas: int, hot_hex: str):
    """Materialize the skewed probe table + small build side; returns
    (lineitem_skewed_path, orders_small_path, hot_key)."""
    from pyspark.sql import functions as F

    from tools.scale_probe import synthesize

    rel_dir = synthesize(
        spark,
        "relational",
        src_dir,
        os.path.join(out_root, f"relational_{replicas}x"),
        replicas,
    )
    skew_dir = os.path.join(out_root, f"skew_{replicas}x")
    os.makedirs(skew_dir, exist_ok=True)

    orders = spark.read.parquet(f"{rel_dir}/orders.parquet")
    # one replica's orders (copy k=0 keeps keys divisible by `replicas`)
    build_path = os.path.join(skew_dir, "orders_small.parquet")
    if not os.path.exists(build_path):
        orders.filter(F.col("o_orderkey") % replicas == 0).write.mode(
            "overwrite"
        ).parquet(build_path)
    hot_key = spark.read.parquet(build_path).agg(
        F.min("o_orderkey")
    ).collect()[0][0]

    probe_path = os.path.join(skew_dir, "lineitem_skewed.parquet")
    if not os.path.exists(probe_path):
        li = spark.read.parquet(f"{rel_dir}/lineitem.parquet")
        redirect = (
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                2,
            )
            < hot_hex
        )
        li.withColumn(
            "l_orderkey",
            F.when(redirect, F.lit(hot_key)).otherwise(F.col("l_orderkey")),
        ).repartition(32).write.mode("overwrite").parquet(probe_path)
    return probe_path, build_path, hot_key


def run_strategy(spark, name: str, probe_path: str, build_path: str):
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.skew import salted_join

    skew_on = "true" if name == "smj_skew_on" else "false"
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
    li = spark.read.parquet(probe_path).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = spark.read.parquet(build_path).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    t0 = time.perf_counter()
    if name == "salted_32":
        j = salted_join(li, o, "l_orderkey", n_salts=32)
    else:
        j = li.join(o, "l_orderkey", "inner")
    row = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    ).collect()[0]
    return round(time.perf_counter() - t0, 2), (row["n"], row["revenue"])


def run_agg_contrast(spark, probe_path: str, uniform_path: str) -> dict:
    """Time groupBy(l_orderkey) over the skewed vs uniform table at the
    same volume; partial aggregation should make the skewed side no
    slower (usually faster — fewer distinct groups reach the shuffle)."""
    from pyspark.sql import functions as F

    def build(path: str):
        # fresh read per run: re-collecting the SAME DataFrame object
        # reuses its registered shuffle map outputs and times ~nothing
        return (
            spark.read.parquet(path)
            .groupBy("l_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("rev"),
            )
            .agg(F.count(F.lit(1)).alias("groups"), F.max("n").alias("max_n"))
        )

    def agg_wall(path: str) -> float:
        build(path).collect()  # warm
        t0 = time.perf_counter()
        build(path).collect()
        return round(time.perf_counter() - t0, 2)

    return {"uniform": agg_wall(uniform_path), "skewed": agg_wall(probe_path)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="join", choices=("join", "agg"))
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out-root", default="/tmp/scale_probe")
    ap.add_argument(
        "--hot-hex",
        default="4d",
        help="md5-prefix threshold: rows below it redirect to the hot key "
        "(4d ~= 30 pct)",
    )
    ap.add_argument(
        "--master",
        default=None,
        help="Spark master override, e.g. local-cluster[4,8,12288] for the "
        "multi-JVM skew A/B (remote shuffle fetch is exactly where skew "
        "should stop being transport-neutral). Run each master in its own "
        "process: the first session fixes the JVM heap.",
    )
    ap.add_argument(
        "--exec-mem-mb",
        type=int,
        default=None,
        help="spark.executor.memory for local-cluster masters (the master "
        "string's MEM field sizes only the worker budget; executors "
        "otherwise launch at the 1g default and die mid-stage)",
    )
    args = ap.parse_args()

    from multiomix_aws_emr_spark.session import build_session

    extra = (
        {"spark.executor.memory": f"{args.exec_mem_mb}m"}
        if args.exec_mem_mb
        else None
    )
    spark = build_session(
        app_name="skew_probe", master=args.master, extra_conf=extra
    )
    spark.sparkContext.setLogLevel("ERROR")
    # model a broadcast-INELIGIBLE build side: force the shuffled path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # right-size the skew trigger for the probe volume (see module doc)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")

    probe_path, build_path, hot_key = synthesize_skewed(
        spark, args.src, args.out_root, args.replicas, args.hot_hex
    )
    if args.mode == "agg":
        uniform_path = os.path.join(
            args.out_root, f"relational_{args.replicas}x", "lineitem.parquet"
        )
        walls = run_agg_contrast(spark, probe_path, uniform_path)
        spark.stop()
        ok = walls["skewed"] <= walls["uniform"] * 1.5
        print(
            json.dumps(
                {
                    "mode": "agg",
                    "wall_sec": walls,
                    "partial_agg_absorbs_skew": ok,
                }
            )
        )
        return 0 if ok else 1

    n_rows = spark.read.parquet(probe_path).count()
    n_hot = (
        spark.read.parquet(probe_path)
        .filter(f"l_orderkey = {hot_key}")
        .count()
    )

    strategies = ("smj_skew_off", "smj_skew_on", "salted_32")
    walls: dict[str, float] = {}
    answers: dict[str, tuple] = {}
    for name in strategies:
        run_strategy(spark, name, probe_path, build_path)  # warm
        walls[name], answers[name] = run_strategy(spark, name, probe_path, build_path)
    spark.stop()

    base_n, base_rev = answers["smj_skew_off"]
    agree = all(
        n == base_n and abs(rev - base_rev) <= 1e-6 * abs(base_rev)
        for n, rev in answers.values()
    )
    ok = agree and walls["smj_skew_off"] >= max(
        walls["smj_skew_on"], walls["salted_32"]
    )
    print(
        json.dumps(
            {
                "n_probe_rows": n_rows,
                "n_hot_rows": n_hot,
                "hot_fraction": round(n_hot / n_rows, 3),
                "wall_sec": walls,
                "answers_agree": agree,
                "mitigations_beat_straggler": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
