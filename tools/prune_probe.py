"""Pruning probe: measure data-skipping effectiveness in BYTES at 100x.

SURVEY.md §6 claims the engine's layouts prune: hive partitioning skips
at planning time from directory names (`scan_partitioned_pruned`),
z-order clustering skips files on multi-dimensional box predicates
(`zorder_scan_pruned`), plain time-sorting skips on time only, and
column pruning keeps a narrow projection from paying for a wide row.
Those claims are plan- and footer-asserted at fixture scale in
tests/test_plans.py; this probe turns them into measured bytes at 100x.

Input: the 100x events corpus (10M rows — synthesized by
tools/scale_probe.py's events tier), rewritten once into four layouts of
64 files each:

  flat        repartition(64), no ordering — the "what you get by
              default" layout and the denominator for every ratio
  bytype      partitionBy(event_type) — low-cardinality dimension
              directories (+ sort within, the first layout decision of
              an event store)
  timesorted  repartitionByRange(ts_ms) — the classic append-order /
              time-clustered layout
  zorder      operators/zorder.write_zordered(user_id, ts_ms) — Morton
              interleave, compact rectangles in (user, time) space

Probed predicates (every layout computes the IDENTICAL answer — checked
with an order-independent checksum):

  typefilter  event_type = 'click' (planning-time directory pruning for
              bytype; footer-stats file skipping for the others iff the
              layout happens to cluster types — flat doesn't)
  box         user_id range x time range (the 2-dimensional case:
              timesorted can skip on time only; zorder skips on both)
  narrow      unfiltered SUM(value) — column pruning: bytes READ vs the
              same scan forced to materialize every column

Metrics per (layout, predicate): `required_mb` — the EXACT bytes a
parquet reader must read, computed from the footers (compressed chunk
sizes of the PROJECTED columns over the row groups whose min/max stats
intersect the predicate — the same skipping logic the reader applies),
plus the scan node's "number of files read" / "size of files read" from
the SQL metrics REST endpoint (runtime evidence of planning-time
partition pruning) and wall time. Stage-level inputBytes is NOT used:
on a local filesystem its Hadoop statistics callback under-reports
(measured: 0.4 MB for a full scan of a 22.6 MB column chunk set), so
the byte claims come from footer arithmetic, not that counter.

Usage:
  python tools/prune_probe.py [--src /root/testdata/sf0.1]
                              [--replicas 100] [--out-root /tmp/prune_probe]

Prints one JSON line per measurement plus parity summaries; exits
non-zero on checksum mismatch.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 64

_SIZE_UNITS = {
    "B": 1,
    "KiB": 1024,
    "MiB": 1024**2,
    "GiB": 1024**3,
    "TiB": 1024**4,
}


def _parse_metric(value: str) -> float:
    """SQL metrics arrive humanized: '1,234', '1018.0 KiB', '2.3 MiB',
    'total (min, med, max (stageId: taskId))\\n2.1 GiB (...)' — take the
    leading total and normalize to a number (bytes for sizes)."""
    head = value.strip().splitlines()[-1] if "\n" in value else value
    m = re.match(r"\s*([\d.,]+)\s*([KMGT]iB|B)?", head)
    if not m:
        return 0.0
    num = float(m.group(1).replace(",", ""))
    return num * _SIZE_UNITS.get(m.group(2) or "", 1)


def _sql_scan_metrics(spark, min_exec_id: int) -> dict:
    """Aggregate scan-node metrics over SQL executions with id >=
    min_exec_id (the ones the current measurement issued)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/sql?details=true&length=1000"
    with urllib.request.urlopen(url, timeout=30) as resp:
        execs = json.load(resp)
    files = size = 0.0
    for e in execs:
        if e.get("id", -1) < min_exec_id:
            continue
        for node in e.get("nodes", []):
            if not node.get("nodeName", "").startswith("Scan parquet"):
                continue
            for metric in node.get("metrics", []):
                if metric.get("name") == "number of files read":
                    files += _parse_metric(metric.get("value", "0"))
                elif metric.get("name") == "size of files read":
                    size += _parse_metric(metric.get("value", "0"))
    return {"files_read": int(files), "files_read_mb": round(size / 1e6, 1)}


def _next_exec_id(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/sql?length=1000"
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            execs = json.load(resp)
    except Exception:
        return 0
    return max((e.get("id", -1) for e in execs), default=-1) + 1


#: columns each predicate's plan projects out of the scan
_PROJECTED = {
    "typefilter": ("ts_ms", "event_type", "value"),
    "box": ("ts_ms", "user_id", "event_type", "value"),
    "userfilter": ("user_id", "event_type", "value"),
    "narrow": ("value",),
    "widerow": ("event_id", "ts_ms", "user_id", "event_type", "value"),
}


def _rg_matches(rg, predicate: str, bounds: dict, part_value: str | None) -> bool:
    """Row-group min/max stats vs the predicate — the reader's own
    skipping test. Missing stats => must read."""

    def rng(name):
        for i in range(rg.num_columns):
            col = rg.column(i)
            if col.path_in_schema == name:
                st = col.statistics
                if st is None or not st.has_min_max:
                    return None
                return st.min, st.max
        return None  # column absent (e.g. partition dir) — no constraint

    if predicate == "typefilter":
        if part_value is not None:
            return part_value == "click"
        r = rng("event_type")
        return r is None or (r[0] <= "click" <= r[1])
    if predicate in ("box", "userfilter"):
        r_u = rng("user_id")
        if r_u is not None and (r_u[1] < bounds["u_lo"] or r_u[0] > bounds["u_hi"]):
            return False
        if predicate == "box":
            r_t = rng("ts_ms")
            if r_t is not None and (
                r_t[1] < bounds["t_lo"] or r_t[0] > bounds["t_hi"]
            ):
                return False
        return True
    return True  # narrow / widerow: unfiltered


def _required_bytes(path: str, predicate: str, bounds: dict) -> dict:
    """Footer arithmetic: bytes a parquet reader must read = compressed
    chunk sizes of the projected columns over predicate-matching row
    groups (hive partition directories are pruned by name)."""
    import pyarrow.parquet as pq

    projected = _PROJECTED[predicate]
    required = 0
    rg_total = rg_matched = 0
    for root, _dirs, files in os.walk(path):
        part_value = None
        m = re.search(r"event_type=([^/]+)", root)
        if m:
            part_value = m.group(1)
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                rg_total += 1
                if not _rg_matches(rg, predicate, bounds, part_value):
                    continue
                rg_matched += 1
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    if col.path_in_schema in projected:
                        required += col.total_compressed_size
    return {
        "required_mb": round(required / 1e6, 1),
        "rg_matched": rg_matched,
        "rg_total": rg_total,
    }


# ---------------------------------------------------------------------------
# layouts


def write_layouts(spark, src_dir: str, out_root: str, replicas: int) -> str:
    """Synthesize the 100x events table once and rewrite it into the four
    probed layouts; returns the layout root."""
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.zorder import write_zordered
    from multiomix_aws_emr_spark.sources.tables import events_v
    from tools.scale_probe import synthesize

    sf_dir = synthesize(
        spark,
        "events",
        src_dir,
        os.path.join(out_root, f"events_{replicas}x"),
        replicas,
    )
    ev = events_v(spark, sf_dir).select(
        "event_id", "ts_ms", "user_id", "event_type", "value"
    )
    layouts = os.path.join(out_root, "layouts")
    flat = os.path.join(layouts, "flat")
    if not os.path.exists(flat):
        ev.repartition(N_FILES).write.mode("overwrite").parquet(flat)
    bytype = os.path.join(layouts, "bytype")
    if not os.path.exists(bytype):
        (
            ev.repartition(N_FILES, "event_type", F.col("user_id") % 16)
            .sortWithinPartitions("ts_ms")
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(bytype)
        )
    timesorted = os.path.join(layouts, "timesorted")
    if not os.path.exists(timesorted):
        (
            ev.repartitionByRange(N_FILES, "ts_ms")
            .sortWithinPartitions("ts_ms")
            .write.mode("overwrite")
            .parquet(timesorted)
        )
    zorder = os.path.join(layouts, "zorder")
    if not os.path.exists(zorder):
        write_zordered(ev, zorder, zorder_by=["user_id", "ts_ms"], num_files=N_FILES)
    return layouts


# ---------------------------------------------------------------------------
# predicates


def _predicate_df(spark, path: str, predicate: str, bounds: dict):
    from pyspark.sql import functions as F

    back = spark.read.parquet(path)
    if predicate == "typefilter":
        return (
            back.filter(F.col("event_type") == "click")
            .groupBy((F.expr("ts_ms div 86400000") * 86400000).alias("day_ms"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
        )
    if predicate == "box":
        return (
            back.filter(
                F.col("user_id").between(bounds["u_lo"], bounds["u_hi"])
                & F.col("ts_ms").between(bounds["t_lo"], bounds["t_hi"])
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
        )
    if predicate == "userfilter":
        # the single-dimension complement: a user-band predicate with NO
        # time bound — the query a time-sorted layout cannot skip for
        return (
            back.filter(F.col("user_id").between(bounds["u_lo"], bounds["u_hi"]))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
        )
    if predicate == "narrow":
        return back.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    if predicate == "widerow":
        # same VISIBLE answer as `narrow`, but force every column through
        # the scan — the denominator that shows what column pruning saves.
        # The all-columns hash is folded in via a decimal accumulator
        # (long sum would overflow under ANSI) multiplied to zero.
        return back.withColumn("_allcols", F.xxhash64(*back.columns)).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("value")
                + F.sum(F.col("_allcols").cast("decimal(38,0)")).cast("double")
                * 0,
                2,
            ).alias("sum_value"),
        )
    raise ValueError(predicate)


PREDICATES_BY_LAYOUT = {
    "typefilter": ("flat", "bytype"),
    "box": ("flat", "timesorted", "zorder"),
    "userfilter": ("flat", "timesorted", "zorder"),
    "narrow": ("flat",),
    "widerow": ("flat",),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--out-root", default="/tmp/prune_probe")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.session import RUNTIME_CONF

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName("prune_probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus if cpus.isdigit() else "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .config("spark.ui.retainedStages", "5000")
    )
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    layouts = write_layouts(spark, args.src, args.out_root, args.replicas)

    # box bounds: middle ~10% of users x middle ~10% of time — measured
    # from the data so the probe is fixture-independent
    flat_path = os.path.join(layouts, "flat")
    stats = (
        spark.read.parquet(flat_path)
        .agg(
            F.expr("percentile_approx(user_id, array(0.45, 0.55))").alias("u"),
            F.expr("percentile_approx(ts_ms, array(0.45, 0.55))").alias("t"),
        )
        .collect()[0]
    )
    bounds = {
        "u_lo": int(stats["u"][0]),
        "u_hi": int(stats["u"][1]),
        "t_lo": int(stats["t"][0]),
        "t_hi": int(stats["t"][1]),
    }

    checksums: dict[str, set] = {}
    rc = 0
    for predicate, layout_names in PREDICATES_BY_LAYOUT.items():
        for layout in layout_names:
            path = os.path.join(layouts, layout)
            df = _predicate_df(spark, path, predicate, bounds)
            exec_floor = _next_exec_id(spark)
            t0 = time.perf_counter()
            row = df.select(
                F.count(F.lit(1)).alias("n_out"),
                F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias(
                    "checksum"
                ),
            ).collect()[0]
            wall = round(time.perf_counter() - t0, 2)
            time.sleep(0.5)
            scan = _sql_scan_metrics(spark, exec_floor)
            print(
                json.dumps(
                    {
                        "predicate": predicate,
                        "layout": layout,
                        "wall_s": wall,
                        "rows_out": row["n_out"],
                        "checksum": str(row["checksum"]),
                        **_required_bytes(path, predicate, bounds),
                        **scan,
                    }
                ),
                flush=True,
            )
            # narrow and widerow share one parity group: identical visible
            # answer, different scan width — that equality IS the
            # column-pruning control
            parity_key = (
                "colprune" if predicate in ("narrow", "widerow") else predicate
            )
            checksums.setdefault(parity_key, set()).add(
                (row["n_out"], str(row["checksum"]))
            )
    for predicate, seen in checksums.items():
        ok = len(seen) == 1
        rc = rc if ok else 1
        print(
            json.dumps({"predicate": predicate, "checksum_parity": ok}),
            flush=True,
        )
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
