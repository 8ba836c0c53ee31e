"""local-cluster vs local[*] A/B: the one axis a single JVM cannot see.

Every scale number recorded so far (BASELINE.md §C-D) ran on local[32]:
one JVM, where "broadcast" is a local memory store reference, "shuffle
fetch" is a local disk read, and closure/Arrow serialization crosses no
process boundary on the JVM side. A real cluster pays all three. Spark's
``local-cluster[N, cores, mem_mb]`` master launches N REAL executor JVMs
(separate processes, real Netty block transfer, real torrent-broadcast,
real serialized task closures and Python workers per executor), which is
the closest a single host gets to multi-executor behavior.

This probe times the heaviest recorded shapes under both masters with the
SAME total core/memory budget and reports the walls side by side:

  q18_1000x     sql_large_volume_customer at the 1000x key-shifted
                relational synth (600M-row lineitem) — the biggest
                shuffle + join volume in the repo's record
  near_minhash_100x
                dedup_near_minhash at the 100x scrambled-copy documents
                synth — banded LSH: wide exploded shuffle + groupBy
  fs_bbha_embeddings
                the grouped-Arrow metaheuristic at sf0.1 — broadcast
                payload + applyInPandas closures, the python-worker-
                per-executor serialization path

With --streaming (a separate invocation because the walls are minutes,
not seconds), two Structured Streaming shapes at the 100x time-ordered
events synth (10M events) — the state-store axis batch shapes cannot
see. Under local-cluster the HDFSBackedStateStore partitions live ON
the executors (load/commit/snapshot per micro-batch per state
partition), micro-batch planning crosses the driver<->executor RPC
boundary every batch, and the applyInPandasWithState shape adds
per-executor Python state workers:

  stream_stateful_100x   applyInPandasWithState per-user running totals
  stream_session_100x    session_window watermark aggregation (append)

Synthetic dirs are produced by tools/scale_probe.synthesize (pure
deterministic expressions) with a plain local[32] session and REUSED for
both masters — only query execution is A/B'd.

Usage:
  python tools/localcluster_probe.py [--out-root /tmp/scale_probe]
      [--executors 2] [--exec-cores 16] [--exec-mem-mb 24576]
      [--skip-synth]   # fail instead of synthesizing when dirs missing
      [--streaming]    # the two streaming state shapes instead
      [--drop-caches]  # root: equalize the page cache per master so
                       # COLD walls compare disk-read vs disk-read
      [--kill-executor] [--kill-at 0.4]
                       # resilience probe instead of the A/B: SIGKILL one
                       # executor JVM mid-query (q18 1000x, or the
                       # stateful stream with --streaming) and assert the
                       # answer checksum matches the uninterrupted run

One JSON line per (master, shape) with min-of-2 warm walls, plus a
summary line with the local-cluster/local ratios. Clean up the synth dirs
after recording results (they are reproducible): rm -rf /tmp/scale_probe*
Streaming runs write their durable replay sink under a per-worker temp
dir which the worker removes itself after measuring.
"""

from __future__ import annotations

import argparse
import gc
import subprocess
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import synthesize  # noqa: E402


def _session(
    master: str,
    app: str,
    driver_mem_mb: int | None = None,
    exec_mem_mb: int | None = None,
    exec_cores: int | None = None,
):
    """Equal-budget session. THREE memory knobs this probe found the hard
    way (each from a failed run):

    * local[*]: the driver JVM IS the executor fleet, so its heap must
      match the summed executor memory the local-cluster side gets
      (q18_1000x OOM'd at the 8g default — BASELINE.md's 1000x rule is
      ~1.5 GB/task);
    * local-cluster[n,cores,MEM]: MEM sizes the WORKER budget only —
      executors still launch at the 1g ``spark.executor.memory`` default
      (-Xmx1024M observed in the executor command) and die mid-stage, so
      the executor heap must be set explicitly;
    * ``spark.driver.memory`` is honored ONLY at JVM launch — the first
      SparkSession in a Python process fixes -Xmx for every later
      session in that process. The streaming probe's first run wedged
      exactly here: the synth session launched the JVM at the 8g
      default, the "48g" local[32] measurement session silently
      inherited it, and the 10M-event session-window state GC-thrashed
      at 0 completed tasks. Hence the subprocess-per-master layout
      below: each master measures in a FRESH process whose first (and
      only) session launches the JVM with the intended heap.
    """
    from multiomix_aws_emr_spark.session import build_session

    if driver_mem_mb is not None:
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{driver_mem_mb}m"
    extra = (
        {"spark.executor.memory": f"{exec_mem_mb}m"} if exec_mem_mb else {}
    )
    if exec_mem_mb and exec_cores:
        # Size executors explicitly like a real cluster submission — this
        # also feeds session.executor_task_share_bytes so the per-query
        # sizing hints compute the per-task share from EXECUTOR heap, not
        # the driver-heap proxy (6x off under multi-JVM masters).
        extra["spark.executor.cores"] = str(exec_cores)
    spark = build_session(app_name=app, master=master, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _time_query(spark, qid: str, sf_dir: str, runs: int = 2) -> tuple[float, float]:
    """(cold, warm-min) walls of a noop-sink execution. The cold first
    run matters here more than in tools/scale_probe: queries backed by
    the session-scoped sketch cache (dedup_near_minhash) pay their wide
    exploded shuffle only on the first execution per session+corpus, so
    the warm min times the cache-hit plan. Both are A/B-relevant — cold
    exercises the full cross-executor shuffle, warm the persisted-block
    reuse path (cached blocks live ON the executors under
    local-cluster)."""
    from multiomix_aws_emr_spark.queries import QUERIES

    walls = []
    for _ in range(runs + 1):
        t0 = time.perf_counter()
        QUERIES[qid](spark, sf_dir).write.mode("overwrite").format("noop").save()
        walls.append(round(time.perf_counter() - t0, 2))
    return walls[0], min(walls[1:])


def _shapes(args) -> tuple[list[tuple[str, str, str]], list[str]]:
    """(shapes, missing synth dirs) for the selected probe set."""
    if args.streaming:
        ev_dir = os.path.join(args.out_root, "events_100x")
        need = [] if os.path.exists(ev_dir) else [ev_dir]
        shapes = [
            ("stream_stateful_100x", "stream_stateful_totals", ev_dir),
            ("stream_session_100x", "stream_session_window", ev_dir),
        ]
    else:
        rel_dir = os.path.join(args.out_root, "relational_1000x")
        doc_dir = os.path.join(args.out_root, "documents_100x")
        need = [d for d in (rel_dir, doc_dir) if not os.path.exists(d)]
        shapes = [
            ("q18_1000x", "sql_large_volume_customer", rel_dir),
            ("near_minhash_100x", "dedup_near_minhash", doc_dir),
            ("fs_bbha_embeddings", "fs_bbha_embeddings", args.src),
        ]
    return shapes, need


def _worker(args) -> int:
    """One master's measurement in a fresh process (fresh JVM => the
    driver heap actually applies). Emits one JSON line per shape."""
    total_cores = args.executors * args.exec_cores
    total_mem_mb = args.executors * args.exec_mem_mb
    if args.streaming:
        # BASELINE.md rule 8(b), learned again the hard way HERE: a
        # memory sink materializes every emitted update row on the
        # driver. Under local-cluster the driver is (correctly) left at
        # its small default heap — the 100x replay's update stream
        # filled it, a full-GC storm ate a job-completion event, and the
        # final noop write hung forever with both executors idle. The
        # durable parquet sink is the production shape; use it for both
        # masters so the A/B compares transport, not sink placement.
        sink = tempfile.mkdtemp(prefix=f"lc_sink_{args.worker}_")
        os.environ.setdefault("SPARK_GRAFT_STREAM_SINK_DIR", sink)
        os.environ.setdefault("SPARK_GRAFT_STREAM_TIMEOUT", "3600")
    else:
        sink = None
    if args.worker == "local":
        master, mem_mb, exec_mem = f"local[{total_cores}]", total_mem_mb, None
    else:
        master = (
            f"local-cluster[{args.executors},{args.exec_cores},{args.exec_mem_mb}]"
        )
        mem_mb, exec_mem = None, args.exec_mem_mb
    shapes, need = _shapes(args)
    if need:
        print(f"missing synth dirs: {need}", file=sys.stderr)
        return 2
    spark = _session(
        master,
        f"lc_probe_{args.worker}",
        driver_mem_mb=mem_mb,
        exec_mem_mb=exec_mem,
        exec_cores=args.exec_cores if exec_mem else None,
    )
    for name, qid, sf_dir in shapes:
        cold, warm = _time_query(spark, qid, sf_dir, runs=args.runs)
        print(
            json.dumps(
                {
                    "master": master,
                    "shape": name,
                    "qid": qid,
                    "cold_wall_sec": cold,
                    "warm_wall_sec": warm,
                }
            ),
            flush=True,
        )
    spark.stop()
    if sink is not None:
        # the durable parquet sink accumulates a 10M-event replay per
        # measurement run; leaving it would strand multiple GB in /tmp
        shutil.rmtree(sink, ignore_errors=True)
    return 0


def _executor_pids() -> list[int]:
    """PIDs of live CoarseGrainedExecutorBackend JVMs (the executor
    processes local-cluster workers launch). The driver JVM never
    matches: its cmdline carries the master string, not the backend
    class."""
    pids = []
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as fh:
                cmd = fh.read()
        except OSError:
            continue
        if b"CoarseGrainedExecutorBackend" in cmd:
            pids.append(int(d))
    return sorted(pids)


def _kill_worker(args) -> int:
    """Executor-loss resilience probe (fresh process, local-cluster only).

    Runs one heavy shape twice on the same app: once uninterrupted
    (reference wall + answer checksum), once with a killer thread that
    SIGKILLs one executor JVM mid-query. The standalone master relaunches
    a replacement executor; lost shuffle blocks surface as FetchFailed
    and the affected stages resubmit, so the probe raises
    ``spark.task.maxFailures`` / ``spark.stage.maxConsecutiveAttempts``
    above their defaults the way a real fleet would. PASS = the killed
    run completes with a checksum identical to the uninterrupted run.

    With ``--decommission`` the probe measures the MITIGATION instead of
    the failure: the session enables the open-source graceful-
    decommission machinery (``spark.decommission.enabled`` +
    storage/shuffle-block migration) and the "kill" is SIGPWR — the
    signal a preemptible fleet's node-termination handler delivers when
    the cloud gives its 60-120 s notice. The executor then stops taking
    tasks, MIGRATES its shuffle/RDD blocks to surviving peers, and exits;
    downstream stages fetch the migrated blocks instead of recomputing
    the dead executor's map share, which is exactly the late-kill
    corollary's named cure (BASELINE.md sizing rule 12). Same warm-fair
    three-run layout, same checksum-parity PASS bar, so the
    decommission-vs-SIGKILL overhead ratios are directly comparable.

    Streaming note: the durable foreachBatch sink appends again when a
    killed micro-batch retries, which is exactly the duplicate class the
    runner's max-per-user reduction already absorbs (n_events is
    monotone per user) — executor loss exercises that idempotence for
    real.
    """
    import hashlib
    import signal
    import threading

    master = (
        f"local-cluster[{args.executors},{args.exec_cores},{args.exec_mem_mb}]"
    )
    sink = None
    shape = args.kill_shape or ("stream" if args.streaming else "q18")
    if shape == "stream":
        sink = tempfile.mkdtemp(prefix="lc_kill_sink_")
        os.environ.setdefault("SPARK_GRAFT_STREAM_SINK_DIR", sink)
        os.environ.setdefault("SPARK_GRAFT_STREAM_TIMEOUT", "3600")
        name, qid, sf_dir = (
            "stream_stateful_100x",
            "stream_stateful_totals",
            os.path.join(args.out_root, "events_100x"),
        )
    elif shape == "interval":
        # the remaining stateful streaming layout: SYMMETRIC two-sided
        # join state (one buffer per side, two watermark nodes) — a
        # different state-store shape than applyInPandasWithState's
        # single per-key map. Outer nulls finalize on the min watermark,
        # so the emitted set is deterministic and checksum-comparable.
        sink = tempfile.mkdtemp(prefix="lc_kill_sink_")
        os.environ.setdefault("SPARK_GRAFT_STREAM_SINK_DIR", sink)
        os.environ.setdefault("SPARK_GRAFT_STREAM_TIMEOUT", "3600")
        name, qid, sf_dir = (
            "stream_interval_100x",
            "stream_interval_join_outer",
            os.path.join(args.out_root, "events_100x"),
        )
    elif shape == "components":
        # the iterative-fixpoint shape: with the default localCheckpoint
        # lineage cut this is EXPECTED to fail on executor loss (blocks
        # are executor-local and the lineage is gone); run with
        # SPARK_GRAFT_RELIABLE_CHECKPOINT=1 to demonstrate recovery —
        # both outcomes are the BASELINE.md r9 record
        name, qid, sf_dir = (
            "minhash_components_1000x",
            "dedup_minhash_components",
            os.path.join(args.out_root, "documents_1000x"),
        )
    elif shape == "incremental":
        # the cross-run ingest shape: batch assign against the persisted
        # band index (pure batch plan — parquet index + docs scan). The
        # session-scoped index cache means the index builds during the
        # warmup run; the killed run exercises the per-ingest hot path
        # (window min + index join + fold) under executor loss. Plain
        # task retry should recover it — this probes that the NEW
        # operator inherits the deterministic-retry class.
        name, qid, sf_dir = (
            "minhash_incremental_1000x",
            "dedup_incremental_minhash",
            os.path.join(args.out_root, "documents_1000x"),
        )
    else:
        name, qid, sf_dir = (
            "q18_1000x",
            "sql_large_volume_customer",
            os.path.join(args.out_root, "relational_1000x"),
        )
    if not os.path.exists(sf_dir):
        print(f"missing synth dir: {sf_dir}", file=sys.stderr)
        return 2

    from multiomix_aws_emr_spark.session import build_session
    from multiomix_aws_emr_spark.queries import QUERIES

    extra_conf = {
        "spark.executor.memory": f"{args.exec_mem_mb}m",
        "spark.executor.cores": str(args.exec_cores),
        "spark.task.maxFailures": "8",
        "spark.stage.maxConsecutiveAttempts": "8",
    }
    if args.decommission:
        extra_conf.update(
            {
                # SIGPWR -> executor decommission with block migration
                # (CoarseGrainedExecutorBackend registers the PWR handler
                # only when decommissioning is enabled)
                "spark.decommission.enabled": "true",
                "spark.storage.decommission.enabled": "true",
                "spark.storage.decommission.shuffleBlocks.enabled": "true",
                "spark.storage.decommission.rddBlocks.enabled": "true",
            }
        )
    spark = build_session(
        app_name="lc_kill",
        master=master,
        extra_conf=extra_conf,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_once():
        t0 = time.perf_counter()
        rows = sorted(map(tuple, QUERIES[qid](spark, sf_dir).collect()))
        wall = round(time.perf_counter() - t0, 2)
        digest = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
        return wall, digest, len(rows)

    # warm-fair: discard a JVM-cold warmup (its checksum still counts as
    # a parity point) so the overhead ratio compares warm vs warm — the
    # first execution otherwise pays codegen/broadcast/page-cache costs
    # the killed run would not, hiding (or inverting) the recovery cost
    _, sum_warmup, _ = run_once()
    wall0, sum0, n0 = run_once()

    state: dict = {
        "killed_pid": None,
        "killed_at_sec": None,
        "hard_killed": None,
    }

    sig = signal.SIGPWR if args.decommission else signal.SIGKILL

    def _killer(delay: float):
        time.sleep(delay)
        pids = _executor_pids()
        if not pids:
            return
        victim = pids[0]
        t = time.perf_counter()
        try:
            os.kill(victim, sig)
        except OSError:
            return
        state["killed_pid"] = victim
        state["killed_at_sec"] = t  # normalized below
        if args.decommission and args.hard_kill_after is not None:
            # The REAL spot lifecycle: the cloud enforces the reclaim
            # regardless of drain state. SIGKILL the same executor after
            # the notice window — blocks migrated so far are safe on
            # peers; anything still local dies with the process.
            time.sleep(args.hard_kill_after)
            try:
                os.kill(victim, signal.SIGKILL)
                state["hard_killed"] = True
            except OSError:
                state["hard_killed"] = False  # already exited (drain done)

    delay = max(1.0, wall0 * args.kill_at)
    t_start = time.perf_counter()
    th = threading.Thread(target=_killer, args=(delay,), daemon=True)
    th.start()
    record = {
        "shape": name,
        "qid": qid,
        "master": master,
        "mechanism": "decommission" if args.decommission else "sigkill",
        "kill_at": args.kill_at,
        "wall_uninterrupted_sec": wall0,
    }
    try:
        wall1, sum1, n1 = run_once()
        record.update(
            completed=True,
            wall_killed_sec=wall1,
            recovery_overhead_ratio=(
                round(wall1 / wall0, 3) if wall0 else None
            ),
            rows=n1,
            checksum_parity=sum0 == sum1 == sum_warmup and n0 == n1,
            checksum=sum1,
        )
    except Exception as exc:  # expected for components + localCheckpoint
        record.update(
            completed=False,
            checksum_parity=False,
            error_class=type(exc).__name__,
            error_head=(str(exc).splitlines() or [""])[0][:300],
        )
    th.join(timeout=5)
    if state["killed_at_sec"] is not None:
        state["killed_at_sec"] = round(state["killed_at_sec"] - t_start, 2)
    record["killed_pid"] = state["killed_pid"]
    record["killed_at_sec"] = state["killed_at_sec"]
    if args.decommission and args.hard_kill_after is not None:
        record["hard_kill_after_sec"] = args.hard_kill_after
        record["hard_killed"] = state["hard_killed"]
    print(json.dumps(record), flush=True)
    try:
        spark.stop()
    except Exception:
        pass  # a failed killed-run can leave the context already torn down
    if sink is not None:
        shutil.rmtree(sink, ignore_errors=True)
    if state["killed_pid"] is None:
        print("kill never landed (query finished first?); not a resilience "
              "result — rerun with a smaller --kill-at", file=sys.stderr)
        return 3
    return 0 if record["checksum_parity"] else 1


def _parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out-root", default="/tmp/scale_probe")
    ap.add_argument("--executors", type=int, default=2)
    ap.add_argument("--exec-cores", type=int, default=16)
    ap.add_argument("--exec-mem-mb", type=int, default=24576)
    ap.add_argument("--skip-synth", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--streaming",
        action="store_true",
        help="probe the two streaming state shapes at events 100x instead "
        "of the three batch shapes (separate run: minutes-long walls)",
    )
    ap.add_argument(
        "--drop-caches",
        action="store_true",
        help="write 3 to /proc/sys/vm/drop_caches before each master's "
        "measurements (root only) so COLD walls compare disk-read vs "
        "disk-read — without it, whichever master runs second re-reads "
        "page-cached parquet and cold ratios are incomparable",
    )
    ap.add_argument(
        "--kill-executor",
        action="store_true",
        help="resilience probe instead of the A/B: run one heavy shape "
        "(q18 1000x, or the stateful stream with --streaming) under "
        "local-cluster, SIGKILL one executor JVM mid-query, and assert "
        "the answer checksum matches the uninterrupted run",
    )
    ap.add_argument(
        "--kill-at",
        type=float,
        default=0.4,
        help="when to kill, as a fraction of the uninterrupted wall",
    )
    ap.add_argument(
        "--decommission",
        action="store_true",
        help="with --kill-executor: graceful decommission instead of "
        "SIGKILL — enable spark.decommission.* block migration and send "
        "SIGPWR (the preemption-notice signal), measuring the mitigation "
        "sizing rule 12 names against the recorded SIGKILL overheads",
    )
    ap.add_argument(
        "--hard-kill-after",
        type=float,
        default=None,
        help="with --decommission: SIGKILL the same executor this many "
        "seconds after the SIGPWR notice — the real spot lifecycle, where "
        "the cloud enforces the reclaim whether or not the drain "
        "finished. hard_killed=false in the record means the drain beat "
        "the deadline",
    )
    ap.add_argument(
        "--kill-shape",
        choices=["q18", "stream", "interval", "components", "incremental"],
        help="which shape the kill probe runs (default: q18, or stream "
        "when --streaming is set). 'interval' is the two-sided "
        "stream-stream join (symmetric join state, two watermarks). "
        "'components' is the iterative-fixpoint "
        "shape: expected to FAIL with the default localCheckpoint lineage "
        "cut and to recover with SPARK_GRAFT_RELIABLE_CHECKPOINT=1. "
        "'incremental' is the cross-run ingest assign against the "
        "persisted band index (pure batch retry class)",
    )
    ap.add_argument(
        "--worker",
        choices=["local", "local-cluster", "kill"],
        help=argparse.SUPPRESS,  # internal: single-master measurement child
    )
    return ap.parse_args(argv)


def _drop_caches() -> bool:
    """Equalize the OS page cache (root): sync + drop_caches=3. Returns
    False (and prints a warning) when not permitted, so the probe still
    runs — with the incomparable-cold caveat back in force."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3\n")
        return True
    except OSError as exc:
        print(f"drop_caches unavailable ({exc}); cold walls share the "
              "page cache", file=sys.stderr)
        return False


def main() -> int:
    args = _parse_args()
    if args.worker == "kill":
        return _kill_worker(args)
    if args.worker:
        return _worker(args)
    if args.kill_executor:
        # one fresh child (fresh JVM heap), local-cluster only — there is
        # no "local" side to a process-death probe
        cmd = [sys.executable, os.path.abspath(__file__), "--skip-synth"]
        for flag in ("src", "out_root", "executors", "exec_cores",
                     "exec_mem_mb", "kill_at"):
            cmd += [f"--{flag.replace('_', '-')}", str(getattr(args, flag))]
        if args.streaming:
            cmd.append("--streaming")
        if args.kill_shape:
            cmd += ["--kill-shape", args.kill_shape]
        if args.decommission:
            cmd.append("--decommission")
        if args.hard_kill_after is not None:
            cmd += ["--hard-kill-after", str(args.hard_kill_after)]
        cmd += ["--worker", "kill"]
        proc = subprocess.run(cmd, text=True)
        return proc.returncode

    shapes, need = _shapes(args)
    if need:
        if args.skip_synth:
            print(f"missing synth dirs: {need}", file=sys.stderr)
            return 2
        # Synth in the PARENT is safe now that measurements run in child
        # processes; the parent JVM's heap never times anything.
        spark = _session(None, "lc_probe_synth")
        if args.streaming:
            synthesize(
                spark, "events", args.src, os.path.join(args.out_root, "events_100x"), 100
            )
        else:
            rel_dir = os.path.join(args.out_root, "relational_1000x")
            doc_dir = os.path.join(args.out_root, "documents_100x")
            if not os.path.exists(rel_dir):
                synthesize(spark, "relational", args.src, rel_dir, 1000)
            if not os.path.exists(doc_dir):
                synthesize(spark, "documents", args.src, doc_dir, 100)
        spark.stop()
        gc.collect()

    # same total budget: local[executors*cores] one JVM (heap = summed
    # executor memory) vs N executor JVMs of cores/mem each (driver stays at the
    # build_session default — it runs no tasks under local-cluster).
    # One FRESH child process per master: the first session in a process
    # fixes the JVM heap (see _session), so sharing a process between
    # masters silently mis-sizes whichever side comes second.
    results: dict[str, dict[str, tuple[float, float]]] = {}
    base_cmd = [sys.executable, os.path.abspath(__file__), "--skip-synth"]
    for flag in ("src", "out_root", "executors", "exec_cores", "exec_mem_mb", "runs"):
        base_cmd += [f"--{flag.replace('_', '-')}", str(getattr(args, flag))]
    if args.streaming:
        base_cmd.append("--streaming")
    for label in ("local", "local-cluster"):
        if args.drop_caches:
            _drop_caches()
        # a wedged worker JVM (e.g. the streaming heap wedge this probe
        # once hit) would otherwise block the parent forever with zero
        # output, since stdout is buffered until the child exits
        budget = float(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT", "3600"))
        try:
            proc = subprocess.run(
                [*base_cmd, "--worker", label],
                capture_output=True,
                text=True,
                timeout=budget + 600.0,
            )
        except subprocess.TimeoutExpired as exc:
            err = (exc.stderr or b"")
            if isinstance(err, bytes):
                err = err.decode(errors="replace")
            print(
                f"worker {label} exceeded {budget + 600.0:.0f}s; "
                f"partial stderr:\n{err[-4000:]}",
                file=sys.stderr,
            )
            continue
        for line in proc.stdout.splitlines():
            if not line.startswith("{"):
                continue
            rec = json.loads(line)
            results.setdefault(rec["shape"], {})[label] = (
                rec["cold_wall_sec"],
                rec["warm_wall_sec"],
            )
            print(line, flush=True)
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            return proc.returncode

    ratios = {
        name: {
            "cold": round(w["local-cluster"][0] / max(w["local"][0], 0.01), 2),
            "warm": round(w["local-cluster"][1] / max(w["local"][1], 0.01), 2),
        }
        for name, w in results.items()
    }
    print(
        json.dumps(
            {
                "summary": "local-cluster_over_local_wall_ratio",
                "executors": args.executors,
                "exec_cores": args.exec_cores,
                "exec_mem_mb": args.exec_mem_mb,
                "ratios": ratios,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
