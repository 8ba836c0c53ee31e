"""Checkpoint-restart recovery (SURVEY.md §5.2.6): a streaming rollup
interrupted mid-replay and restarted from the SAME checkpoint must
converge to the identical final table as an uninterrupted run.

This is the streaming fault-tolerance contract a 1000-executor cluster
actually exercises — drivers get preempted, streams restart from their
checkpoint, and the offset log + idempotent foreachBatch sink (dynamic
partition overwrite) must together deliver an exactly-once TABLE even
though the in-flight micro-batch at the kill point is replayed
at-least-once. The double-run test in tests/test_streaming.py covers
full-replay idempotency; this one covers the offset-log path: the
restarted query must RESUME (skip committed batches) and finish the
remainder."""

import time

from tests.test_streaming import _BASE, _write_events

_DAY_MS = 24 * 3_600_000


def _source_dir(tmp_path):
    """Three single-file micro-batches with ascending mtimes."""
    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [(1, _BASE + 60_000, "click", 1.5), (2, _BASE + _DAY_MS, "view", 2.0)],
        [(3, _BASE + 90_000, "click", 3.0), (4, _BASE + 2 * _DAY_MS, "view", 4.0)],
        [(5, _BASE + 120_000, "click", 5.0), (6, _BASE + _DAY_MS + 60_000, "view", 6.0)],
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        _write_events(str(src / f"b{i}.parquet"), rows, now - 60 + i)
    return str(src)


def _start_rollup(spark, src, out_dir, ckpt, trigger_available_now):
    from pyspark.sql import DataFrame

    from multiomix_aws_emr_spark.streaming.upsert import rollup_plan

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # glob all three batch files, one per micro-batch
    static = spark.read.option("pathGlobFilter", "b*.parquet").parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "b*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = rollup_plan(stream)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .partitionBy("window_start_ms", "event_type")
            .parquet(out_dir)
        )

    writer = (
        out.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def test_restart_from_checkpoint_converges(spark, tmp_path):
    from multiomix_aws_emr_spark.session import configure
    from multiomix_aws_emr_spark.streaming.util import bounded_state_partitions

    configure(spark)
    src = _source_dir(tmp_path)

    with bounded_state_partitions(spark, 4):
        # reference: uninterrupted availableNow run, its own checkpoint
        ref_out = str(tmp_path / "ref_out")
        q = _start_rollup(
            spark, src, ref_out, str(tmp_path / "ck_ref"), True
        )
        q.awaitTermination(120)
        ref = sorted(map(tuple, spark.read.parquet(ref_out).select(
            "window_start_ms", "event_type", "n", "sum_value").collect()))

        # interrupted run: continuous trigger, stop after >=1 committed
        # batch, restart from the SAME checkpoint with availableNow
        out2 = str(tmp_path / "rec_out")
        ckpt = str(tmp_path / "ck_rec")
        q = _start_rollup(spark, src, out2, ckpt, False)
        # progress-based deadline (same shape as rate_source_smoke): keep
        # waiting while NEW progress events arrive, fail only after 60s
        # with no new micro-batch at all — load-proof, wedge-detecting
        committed = 0
        seen_batches: set = set()
        last_progress = time.time()
        while time.time() - last_progress < 60:
            for p in q.recentProgress:
                if p["batchId"] not in seen_batches:
                    seen_batches.add(p["batchId"])
                    last_progress = time.time()
            committed = sum(
                1 for p in q.recentProgress if p["numInputRows"] > 0
            )
            if committed >= 1:
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(60)
        assert committed >= 1, "stream never committed a batch before stop"

        q = _start_rollup(spark, src, out2, ckpt, True)
        q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(out2).select(
        "window_start_ms", "event_type", "n", "sum_value").collect()))
    assert got == ref and len(got) > 0
    # and both equal the batch aggregate over all three files
    day0 = _BASE - _BASE % _DAY_MS
    assert ref == [
        (day0, "click", 3, 9.5),
        (day0 + _DAY_MS, "view", 2, 8.0),
        (day0 + 2 * _DAY_MS, "view", 1, 4.0),
    ]


def test_stateful_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState state-STORE recovery (distinct from the
    offset-log path above): per-key (n, s) state committed before the
    interruption must be reloaded from the checkpoint on restart, so a
    user's post-restart update reflects pre-restart events. The sink is a
    recoverable foreachBatch parquet append (the memory sink refuses
    checkpoint recovery by design); both query incarnations append to the
    same table and the runner's max-based reduction absorbs the
    at-least-once replay of the in-flight batch."""
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.session import configure
    from multiomix_aws_emr_spark.streaming.stateful import running_totals_plan
    from multiomix_aws_emr_spark.streaming.util import bounded_state_partitions
    from tests.test_streaming import _write_user_events

    configure(spark)
    src = tmp_path / "usrc"
    src.mkdir()
    now = time.time()
    _write_user_events(str(src / "b0.parquet"), [(0, 1, 10.0), (1, 2, 5.0)], now - 60)
    _write_user_events(str(src / "b1.parquet"), [(2, 1, 7.0)], now - 59)
    _write_user_events(
        str(src / "b2.parquet"), [(3, 1, 3.0), (4, 2, 2.0)], now - 58
    )

    static = spark.read.option("pathGlobFilter", "b*.parquet").parquet(str(src))
    updates_dir = str(tmp_path / "updates")

    def start(available_now):
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", "b*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        writer = (
            running_totals_plan(stream)
            .writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(updates_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck_state"))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    with bounded_state_partitions(spark, 4):
        q = start(False)
        deadline = time.time() + 60
        committed = 0
        while time.time() < deadline:
            committed = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
            if committed >= 1:
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(60)
        assert committed >= 1, "stream never committed a batch before stop"

        q = start(True)
        q.awaitTermination(120)

    merged = spark.read.parquet(updates_dir)
    totals = {
        r.user_id: (r.n_events, round(r.sum_value, 2))
        for r in merged.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .collect()
    }
    # equals the batch aggregate over ALL files — only possible if the
    # state store reloaded pre-restart (n, s) on restart
    assert totals == {1: (3, 20.0), 2: (2, 7.0)}
