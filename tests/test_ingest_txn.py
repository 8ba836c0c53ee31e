"""Transactional dedup store (VERDICT r11 tasks 2-4): atomic
replay-idempotent ingest, crash convergence at every kill point,
loud-failure concurrent-writer contract, and index retraction."""

import json
import os
import shutil
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.operators.dedup import band_index, banded_buckets
from multiomix_aws_emr_spark.operators.ingest import (
    ConcurrentIngestError,
    _commit_manifest,
    ingest_batch,
    latest_manifest,
    read_assignments,
    read_index,
    read_membership,
    retract_batch,
    sweep_orphans,
)
from multiomix_aws_emr_spark.sources.tables import load

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select("doc_id", "text")


def _banded(docs):
    return banded_buckets(docs, text_col="text", id_col="doc_id", portable=True)


def _index_set(df):
    return {(r.band, r.bucket, r.rep) for r in df.collect()}


def _assign_map(df):
    return {r.doc_id: r.rep_id for r in df.collect()}


def _clean_two_batch_store(spark, docs, root):
    ingest_batch(
        spark, root, docs.filter(F.col("doc_id") % 4 != 0), batch_id="b0"
    )
    return ingest_batch(
        spark, root, docs.filter(F.col("doc_id") % 4 == 0), batch_id="b1"
    )


def test_two_batch_ingest_matches_rebuild(spark, docs, tmp_path):
    """Final committed index == from-scratch band_index over everything;
    the second batch's assignments == the non-transactional index path."""
    from multiomix_aws_emr_spark.operators.dedup import incremental_assign

    root = str(tmp_path / "store")
    got = _assign_map(_clean_two_batch_store(spark, docs, root))
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    expected = _assign_map(
        incremental_assign(
            _banded(new), band_index(_banded(old), id_col="doc_id"),
            id_col="doc_id",
        )
    )
    assert got == expected
    assert _index_set(read_index(spark, root)) == _index_set(
        band_index(_banded(docs), id_col="doc_id")
    )
    ver, m = latest_manifest(root)
    assert ver == 2 and set(m["batches"]) == {"b0", "b1"}


def test_replay_committed_batch_is_noop(spark, docs, tmp_path):
    root = str(tmp_path / "store")
    first = _assign_map(_clean_two_batch_store(spark, docs, root))
    ver_before, _ = latest_manifest(root)
    again = ingest_batch(
        spark, root, docs.filter(F.col("doc_id") % 4 == 0), batch_id="b1"
    )
    assert _assign_map(again) == first
    assert latest_manifest(root)[0] == ver_before  # nothing re-committed


@pytest.mark.parametrize(
    "crash_point", ["after_banded", "after_assign", "after_index", "before_commit"]
)
def test_crash_then_rerun_converges(spark, docs, tmp_path, monkeypatch, crash_point):
    """The kill matrix: a crash at ANY point of the second ingest leaves
    the v1 store intact and readable, and a plain re-run converges to
    exactly the clean two-batch result."""
    clean_root = str(tmp_path / "clean")
    clean_assigns = _assign_map(_clean_two_batch_store(spark, docs, clean_root))
    clean_index = _index_set(read_index(spark, clean_root))

    root = str(tmp_path / "crashy")
    batch0 = docs.filter(F.col("doc_id") % 4 != 0)
    batch1 = docs.filter(F.col("doc_id") % 4 == 0)
    ingest_batch(spark, root, batch0, batch_id="b0")
    v1_index = _index_set(read_index(spark, root))

    monkeypatch.setenv("SPARK_GRAFT_INGEST_CRASH_POINT", crash_point)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_batch(spark, root, batch1, batch_id="b1")
    # consistency at the kill point: committed state is still v1, whole
    ver, m = latest_manifest(root)
    assert ver == 1 and "b1" not in m["batches"]
    assert _index_set(read_index(spark, root)) == v1_index
    with pytest.raises(KeyError):
        read_assignments(spark, root, "b1")

    monkeypatch.delenv("SPARK_GRAFT_INGEST_CRASH_POINT")
    rerun = ingest_batch(spark, root, batch1, batch_id="b1")
    assert _assign_map(rerun) == clean_assigns
    assert _index_set(read_index(spark, root)) == clean_index
    # the dead attempt's staging is orphaned, invisible, and sweepable
    swept = sweep_orphans(root)
    assert _index_set(read_index(spark, root)) == clean_index
    assert _assign_map(read_assignments(spark, root, "b1")) == clean_assigns
    if crash_point in ("after_index", "before_commit"):
        assert any(e.startswith("index_v2") for e in swept)


def test_hard_kill_subprocess_then_recover(spark, docs, tmp_path, sf_dir):
    """The r9/r10 kill-probe pattern, process-level: a separate driver
    process is SIGKILLED (os._exit 137) mid-ingest — between the index
    write and the manifest commit — and this session's plain re-run
    converges. Proves convergence needs no in-process cleanup handler."""
    root = str(tmp_path / "store")
    batch0 = docs.filter(F.col("doc_id") % 4 != 0)
    ingest_batch(spark, root, batch0, batch_id="b0")
    v1 = latest_manifest(root)

    script = f"""
import sys
sys.path.insert(0, {REPO!r})
from multiomix_aws_emr_spark.session import build_session
from multiomix_aws_emr_spark.operators.ingest import ingest_batch
from pyspark.sql import functions as F
from multiomix_aws_emr_spark.sources.tables import load
spark = build_session(master="local[4]", shuffle_partitions=4)
docs = load(spark, {sf_dir!r}, "documents").select("doc_id", "text")
ingest_batch(spark, {root!r}, docs.filter(F.col("doc_id") % 4 == 0), batch_id="b1")
"""
    env = dict(
        os.environ,
        SPARK_GRAFT_INGEST_CRASH_POINT="after_index",
        SPARK_GRAFT_INGEST_CRASH_MODE="exit",
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True, timeout=300
    )
    assert proc.returncode == 137, proc.stderr.decode()[-2000:]
    assert latest_manifest(root) == v1  # store untouched by the dead driver

    rerun = ingest_batch(
        spark, root, docs.filter(F.col("doc_id") % 4 == 0), batch_id="b1"
    )
    assert _index_set(read_index(spark, root)) == _index_set(
        band_index(_banded(docs), id_col="doc_id")
    )
    assert len(_assign_map(rerun)) == docs.filter(F.col("doc_id") % 4 == 0).count()


def test_concurrent_commit_fails_loudly(spark, docs, tmp_path):
    """VERDICT r11 task 4: two writers racing one version slot — the
    loser gets ConcurrentIngestError, never a silent lost update, and a
    retry from the new manifest lands BOTH batches' buckets."""
    root = str(tmp_path / "store")
    ingest_batch(spark, root, docs.filter(F.col("doc_id") % 4 == 1), batch_id="bA")
    # the direct contract: claiming an already-committed version slot raises
    _, m = latest_manifest(root)
    with pytest.raises(ConcurrentIngestError):
        _commit_manifest(root, 1, m)

    # end-to-end interleave: writer 1 stages then dies pre-commit; writer 2
    # commits v2; writer 1's retry targets v3 and loses nothing
    os.environ["SPARK_GRAFT_INGEST_CRASH_POINT"] = "before_commit"
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            ingest_batch(
                spark, root, docs.filter(F.col("doc_id") % 4 == 2), batch_id="bB"
            )
    finally:
        os.environ.pop("SPARK_GRAFT_INGEST_CRASH_POINT", None)
    ingest_batch(spark, root, docs.filter(F.col("doc_id") % 4 == 3), batch_id="bC")
    ingest_batch(spark, root, docs.filter(F.col("doc_id") % 4 == 2), batch_id="bB")
    ver, m = latest_manifest(root)
    assert ver == 3 and set(m["batches"]) == {"bA", "bB", "bC"}
    survivors = docs.filter(F.col("doc_id") % 4 != 0)
    assert _index_set(read_index(spark, root)) == _index_set(
        band_index(_banded(survivors), id_col="doc_id")
    )


def test_retract_rep_doc_equals_surviving_rebuild(spark, docs, tmp_path):
    """VERDICT r11 task 2's done-bar: delete a document that IS a bucket
    rep — the retracted index must equal band_index over the surviving
    corpus (next-smallest member takes over; empty buckets vanish)."""
    root = str(tmp_path / "store")
    _clean_two_batch_store(spark, docs, root)
    membership = read_membership(spark, root)
    # pick a rep that shares a bucket with at least one other doc — the
    # case min-merge could never forget — plus a solo doc's rep
    crowded = (
        membership.groupBy("band", "bucket")
        .agg(F.min("doc_id").alias("rep"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("rep")
        .limit(1)
    )
    victim = [r.rep for r in crowded.collect()]
    assert victim, "fixture has no multi-member bucket"
    retract = spark.createDataFrame([(v,) for v in victim], "doc_id BIGINT")
    retract_batch(spark, root, retract, op_id="gdpr-1")

    surviving = docs.join(retract, "doc_id", "left_anti")
    assert _index_set(read_index(spark, root)) == _index_set(
        band_index(_banded(surviving), id_col="doc_id")
    )
    mset = {
        (r.band, r.bucket, r.doc_id)
        for r in read_membership(spark, root).collect()
    }
    expected_m = {
        (r.band, r.bucket, r.doc_id) for r in _banded(surviving).collect()
    }
    assert mset == expected_m
    # replay of the same retraction is a no-op
    ver_before, _ = latest_manifest(root)
    retract_batch(spark, root, retract, op_id="gdpr-1")
    assert latest_manifest(root)[0] == ver_before
    # a retracted doc is never again proposed as rep to future ingests
    assert not read_index(spark, root).filter(
        F.col("rep").isin(victim)
    ).count()


def test_params_pinned_and_uri_root_refused(spark, docs, tmp_path):
    root = str(tmp_path / "store")
    ingest_batch(spark, root, docs.limit(5), batch_id="b0")
    with pytest.raises(ValueError, match="params"):
        ingest_batch(spark, root, docs.limit(5), batch_id="b1", bands=8)
    with pytest.raises(ValueError, match="conditional-put"):
        ingest_batch(spark, "s3a://bucket/store", docs, batch_id="x")


def test_declared_query_matches_index_path(spark, sf_dir):
    """pipeline_incremental_ingest emits exactly what the
    non-transactional dedup_incremental_minhash emits."""
    from multiomix_aws_emr_spark.queries import QUERIES

    txn = _assign_map(QUERIES["pipeline_incremental_ingest"](spark, sf_dir))
    plain = _assign_map(QUERIES["dedup_incremental_minhash"](spark, sf_dir))
    assert txn == plain


def test_manifest_publish_is_complete_file(tmp_path):
    """The link-publish protocol: a published manifest parses, and no
    temp residue is left next to it."""
    root = str(tmp_path / "store")
    _commit_manifest(root, 1, {"version": 1, "batches": {}})
    ver, m = latest_manifest(root)
    assert ver == 1 and m["version"] == 1
    residue = [
        f for f in os.listdir(os.path.join(root, "manifest"))
        if f.startswith(".tmp")
    ]
    assert residue == []
    with open(os.path.join(root, "manifest", "v000001.json")) as fh:
        json.load(fh)


def test_precomputed_sketch_hook_matches_raw_path(spark, docs, tmp_path):
    """Supplying a corpus-sketch slice through ``banded=`` must commit
    exactly what the raw-text path commits (per-doc sketches are
    subset-invariant)."""
    raw_root = str(tmp_path / "raw")
    raw = _assign_map(_clean_two_batch_store(spark, docs, raw_root))

    sketch = _banded(docs)
    root = str(tmp_path / "sliced")
    ingest_batch(
        spark, root, docs.filter(F.col("doc_id") % 4 != 0), batch_id="b0",
        banded=sketch.filter(F.col("doc_id") % 4 != 0),
    )
    got = _assign_map(
        ingest_batch(
            spark, root, docs.filter(F.col("doc_id") % 4 == 0), batch_id="b1",
            banded=sketch.filter(F.col("doc_id") % 4 == 0),
        )
    )
    assert got == raw
    assert _index_set(read_index(spark, root)) == _index_set(
        read_index(spark, raw_root)
    )


def _write_doc_batches(spark, docs, dirpath, n_files=4):
    """The corpus as n single-file parquet batches with ascending mtimes
    (doc_id % n == i -> file i), so a maxFilesPerTrigger=1 stream ingests
    them as n ordered micro-batches."""
    import time as _time

    os.makedirs(dirpath, exist_ok=True)
    pdf = docs.select("doc_id", "text").toPandas()
    now = _time.time()
    for i in range(n_files):
        part = pdf[pdf.doc_id % n_files == i]
        p = os.path.join(dirpath, f"b{i}.parquet")
        part.to_parquet(p, index=False)
        os.utime(p, (now - 60 * (n_files - i), now - 60 * (n_files - i)))
    return dirpath


def _doc_stream(spark, src):
    static = spark.read.parquet(src)
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_stream_ingest_multibatch_matches_rebuild(spark, docs, tmp_path):
    """Four micro-batches through foreachBatch: the maintained index must
    equal the from-scratch build, each doc assigned exactly once, and
    every rep already-ingested at its doc's batch (the rolling-ingest
    order contract)."""
    from multiomix_aws_emr_spark.streaming.ingest import run_stream_ingest

    src = _write_doc_batches(spark, docs, str(tmp_path / "src"))
    root = str(tmp_path / "store")
    assigns = run_stream_ingest(
        spark, root, _doc_stream(spark, src), portable=True
    )
    amap = _assign_map(assigns)
    assert len(amap) == docs.count()
    assert _index_set(read_index(spark, root)) == _index_set(
        band_index(_banded(docs), id_col="doc_id")
    )
    for doc_id, rep in amap.items():
        assert rep == doc_id or (rep % 4) <= (doc_id % 4)
    ver, m = latest_manifest(root)
    assert ver == 4 and len(m["batches"]) == 4


def test_stream_ingest_crash_restart_converges(spark, docs, tmp_path, monkeypatch):
    """Kill the stream mid-micro-batch (injected crash inside the store
    commit), restart from the SAME checkpoint: the offset log replays the
    failed batch with the same id, the store's replay rule absorbs any
    already-committed ones, and the final state equals a clean run."""
    from pyspark.errors import StreamingQueryException

    from multiomix_aws_emr_spark.streaming.ingest import run_stream_ingest

    src = _write_doc_batches(spark, docs, str(tmp_path / "src"))
    clean_root = str(tmp_path / "clean")
    clean = _assign_map(
        run_stream_ingest(
            spark, clean_root, _doc_stream(spark, src), portable=True
        )
    )

    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    monkeypatch.setenv("SPARK_GRAFT_INGEST_CRASH_POINT", "before_commit")
    with pytest.raises(StreamingQueryException, match="injected crash"):
        run_stream_ingest(
            spark, root, _doc_stream(spark, src),
            checkpoint=ckpt, portable=True,
        )
    assert latest_manifest(root)[0] == 0  # died in batch 0: nothing committed
    monkeypatch.delenv("SPARK_GRAFT_INGEST_CRASH_POINT")
    got = _assign_map(
        run_stream_ingest(
            spark, root, _doc_stream(spark, src),
            checkpoint=ckpt, portable=True,
        )
    )
    assert got == clean
    assert _index_set(read_index(spark, root)) == _index_set(
        read_index(spark, clean_root)
    )


def test_stream_ingest_late_arrival_continues(spark, docs, tmp_path):
    """Two-phase arrival: ingest two files, then two more land in the
    source dir — resuming with the same checkpoint + store ingests ONLY
    the new files (no version burned re-reading the old) and converges
    to the full-corpus index."""
    from multiomix_aws_emr_spark.streaming.ingest import run_stream_ingest

    staged = _write_doc_batches(spark, docs, str(tmp_path / "staged"))
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in (0, 1):
        shutil.copy2(os.path.join(staged, f"b{i}.parquet"), src)
    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    run_stream_ingest(
        spark, root, _doc_stream(spark, src),
        checkpoint=ckpt, portable=True,
    )
    assert latest_manifest(root)[0] == 2
    for i in (2, 3):
        shutil.copy2(os.path.join(staged, f"b{i}.parquet"), src)
    assigns = run_stream_ingest(
        spark, root, _doc_stream(spark, src),
        checkpoint=ckpt, portable=True,
    )
    ver, m = latest_manifest(root)
    assert ver == 4 and len(m["batches"]) == 4  # old files NOT re-ingested
    assert len(_assign_map(assigns)) == docs.count()
    assert _index_set(read_index(spark, root)) == _index_set(
        band_index(_banded(docs), id_col="doc_id")
    )


def test_compact_store_preserves_reads_and_replay(spark, docs, tmp_path):
    """Compaction collapses per-batch assignment dirs into one archive:
    reads (per-batch and all), replay no-ops, later ingests, and the
    sweep of superseded loose dirs all keep working."""
    from multiomix_aws_emr_spark.operators.ingest import (
        compact_store,
        read_all_assignments,
    )

    root = str(tmp_path / "store")
    batches = {
        f"b{i}": docs.filter(F.col("doc_id") % 4 == i) for i in range(3)
    }
    for bid, b in batches.items():
        ingest_batch(spark, root, b, batch_id=bid)
    before_all = _assign_map(read_all_assignments(spark, root))
    before_b1 = _assign_map(read_assignments(spark, root, "b1"))

    assert compact_store(spark, root) is True
    ver, m = latest_manifest(root)
    assert ver == 4
    assert all("archived" in rec for rec in m["batches"].values())
    assert _assign_map(read_all_assignments(spark, root)) == before_all
    assert _assign_map(read_assignments(spark, root, "b1")) == before_b1
    # replay of an archived batch: no new version, archive rows returned
    replay = ingest_batch(spark, root, batches["b1"], batch_id="b1")
    assert _assign_map(replay) == before_b1
    assert latest_manifest(root)[0] == ver
    # nothing new to compact twice
    assert compact_store(spark, root) is False

    # superseded loose batch dirs are now sweepable; reads survive
    swept = sweep_orphans(root)
    assert any(e.startswith("batches/") for e in swept)
    assert _assign_map(read_all_assignments(spark, root)) == before_all

    # the store keeps ingesting after compaction (archive + loose mix)
    ingest_batch(
        spark, root, docs.filter(F.col("doc_id") % 4 == 3), batch_id="b3"
    )
    assert len(_assign_map(read_all_assignments(spark, root))) == docs.count()
    assert _index_set(read_index(spark, root)) == _index_set(
        band_index(_banded(docs), id_col="doc_id")
    )


def test_empty_batch_burns_no_version(spark, docs, tmp_path):
    root = str(tmp_path / "store")
    ingest_batch(spark, root, docs.limit(20), batch_id="b0")
    ver_before, _ = latest_manifest(root)
    out = ingest_batch(
        spark, root, docs.filter(F.lit(False)), batch_id="empty"
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "rep_id"]
    ver, m = latest_manifest(root)
    assert ver == ver_before and "empty" not in m["batches"]


def test_compact_crash_then_rerun_converges(spark, docs, tmp_path, monkeypatch):
    """Compaction is a transaction too: a crash before its commit leaves
    the loose layout fully readable, and a re-run compacts cleanly."""
    from multiomix_aws_emr_spark.operators.ingest import (
        compact_store,
        read_all_assignments,
    )

    root = str(tmp_path / "store")
    for i in range(3):
        ingest_batch(
            spark, root, docs.filter(F.col("doc_id") % 4 == i), batch_id=f"b{i}"
        )
    before = _assign_map(read_all_assignments(spark, root))
    ver_before, _ = latest_manifest(root)
    monkeypatch.setenv("SPARK_GRAFT_INGEST_CRASH_POINT", "before_commit")
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_store(spark, root)
    assert latest_manifest(root)[0] == ver_before
    assert _assign_map(read_all_assignments(spark, root)) == before
    monkeypatch.delenv("SPARK_GRAFT_INGEST_CRASH_POINT")
    assert compact_store(spark, root) is True
    assert _assign_map(read_all_assignments(spark, root)) == before


def test_recrawl_cycle_retract_then_reingest(spark, docs, tmp_path):
    """The documented recrawl story end-to-end: retract a rep document,
    then re-ingest its (new) text as a normal batch — the final index
    equals a from-scratch build over the final corpus state, and the
    recrawled doc assigns against the post-retraction index."""
    from pyspark.sql import functions as SF

    root = str(tmp_path / "store")
    _clean_two_batch_store(spark, docs, root)
    membership = read_membership(spark, root)
    crowded_rep = (
        membership.groupBy("band", "bucket")
        .agg(SF.min("doc_id").alias("rep"), SF.count("*").alias("n"))
        .filter(SF.col("n") >= 2)
        .limit(1)
        .collect()[0]
        .rep
    )
    victims = spark.createDataFrame([(crowded_rep,)], "doc_id BIGINT")
    retract_batch(spark, root, victims, op_id="recrawl-drop")

    # the recrawled document returns with CHANGED text (same id)
    recrawled = docs.filter(SF.col("doc_id") == crowded_rep).select(
        "doc_id", SF.concat(SF.lit("fresh recrawl body "), SF.col("text")).alias("text")
    )
    assigns = ingest_batch(spark, root, recrawled, batch_id="recrawl-1")
    amap = _assign_map(assigns)
    assert set(amap) == {crowded_rep}

    final_corpus = docs.filter(SF.col("doc_id") != crowded_rep).unionByName(
        recrawled
    )
    assert _index_set(read_index(spark, root)) == _index_set(
        band_index(_banded(final_corpus), id_col="doc_id")
    )


def test_time_travel_reads_and_vacuum_retention(spark, docs, tmp_path):
    """Time travel (r12): ``read_index(version=v)`` serves each committed
    snapshot bit-exactly (== the from-scratch index over the corpus as of
    that version); vacuum's ``retain_versions`` window bounds how deep the
    data stays readable, and a swept version fails LOUDLY instead of
    silently serving a newer snapshot."""
    from multiomix_aws_emr_spark.operators.ingest import manifest_at

    root = str(tmp_path / "store")
    corpus = None
    snap = {}
    for i in range(3):
        b = docs.filter(F.col("doc_id") % 4 == i)
        ingest_batch(spark, root, b, batch_id=f"b{i}")
        corpus = b if corpus is None else corpus.unionByName(b)
        snap[i + 1] = _index_set(band_index(_banded(corpus), id_col="doc_id"))

    for v, expect in snap.items():
        assert _index_set(read_index(spark, root, version=v)) == expect
    assert _index_set(read_index(spark, root)) == snap[3]
    assert manifest_at(root, 3)["parent"] == 2  # chain walks back
    with pytest.raises(ValueError, match="no committed version"):
        manifest_at(root, 99)

    # vacuum keeping one predecessor: v2/v3 data survives, v1's is swept
    swept = sweep_orphans(root, retain_versions=1)
    assert any(e.startswith("index_v1_") for e in swept)
    assert _index_set(read_index(spark, root, version=2)) == snap[2]
    assert _index_set(read_index(spark, root, version=3)) == snap[3]
    with pytest.raises(ValueError, match="vacuumed"):
        read_index(spark, root, version=1)
    with pytest.raises(ValueError, match="vacuumed"):
        read_membership(spark, root, version=1)
    # history stays ENUMERABLE past the window (manifests are kept)
    assert manifest_at(root, 1)["version"] == 1


def test_diff_versions_reconstructs_and_covers_all_changes(spark, docs, tmp_path):
    """diff_versions is a faithful changelog: applying the v1->v3 diff to
    the v1 snapshot reproduces the v3 snapshot exactly (added + rep_changed
    + removed — the removed arm exercised via a retraction version), and
    adjacent-version diffs never report an unchanged bucket."""
    from multiomix_aws_emr_spark.operators.ingest import diff_versions

    root = str(tmp_path / "store")
    _clean_two_batch_store(spark, docs, root)  # v1 history, v2 incoming
    # v3: retract one crowded-bucket rep so 'removed'/'rep_changed' occur
    membership = read_membership(spark, root)
    crowded_rep = (
        membership.groupBy("band", "bucket")
        .agg(F.min("doc_id").alias("rep"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .limit(1)
        .collect()[0]
        .rep
    )
    victims = spark.createDataFrame([(crowded_rep,)], "doc_id BIGINT")
    retract_batch(spark, root, victims, op_id="gdpr-1")

    d = diff_versions(spark, root, 1, 3).collect()
    kinds = {r.change for r in d}
    assert "rep_changed" in kinds or "removed" in kinds
    assert all(
        (r.change == "added") == (r.rep_from is None)
        and (r.change == "removed") == (r.rep_to is None)
        for r in d
    )
    v1 = _index_set(read_index(spark, root, version=1))
    v3 = _index_set(read_index(spark, root, version=3))
    patched = {
        t for t in v1
        if (t[0], t[1]) not in {(r.band, r.bucket) for r in d}
    } | {(r.band, r.bucket, r.rep_to) for r in d if r.rep_to is not None}
    assert patched == v3
    # adjacent diff reports only true changes (no unchanged buckets)
    v2 = _index_set(read_index(spark, root, version=2))
    d12 = diff_versions(spark, root, 1, 2).collect()
    for r in d12:
        if r.change == "rep_changed":
            assert (r.band, r.bucket, r.rep_from) in v1
            assert (r.band, r.bucket, r.rep_to) in v2
            assert r.rep_from != r.rep_to


def test_store_history_describes_the_chain(spark, docs, tmp_path):
    """DESCRIBE HISTORY: every committed version appears with its parent,
    operation id, and kind — ingest, retract, and compact all legible
    from the manifest chain alone."""
    from multiomix_aws_emr_spark.operators.ingest import (
        compact_store,
        store_history,
    )

    root = str(tmp_path / "store")
    _clean_two_batch_store(spark, docs, root)
    victims = (
        read_index(spark, root).select(F.col("rep").alias("doc_id")).limit(5)
    )
    retract_batch(spark, root, victims, op_id="gdpr-7")
    assert compact_store(spark, root) is True

    h = {r.version: r for r in store_history(spark, root).collect()}
    assert set(h) == {1, 2, 3, 4}
    assert (h[1].op_id, h[1].kind, h[1].parent) == ("b0", "ingest", 0)
    assert (h[2].op_id, h[2].kind, h[2].parent) == ("b1", "ingest", 1)
    assert (h[3].op_id, h[3].kind, h[3].parent) == ("gdpr-7", "retract", 2)
    assert (h[4].op_id, h[4].kind, h[4].parent) == (None, "compact", 3)
    assert h[4].n_batches == 3


def test_assignment_reads_time_travel(spark, docs, tmp_path):
    """Assignment reads honor the version chain too: as of v1 only the
    first batch exists (the second raises KeyError), and the all-batches
    scan at v1 returns exactly the first batch's rows."""
    from multiomix_aws_emr_spark.operators.ingest import read_all_assignments

    root = str(tmp_path / "store")
    _clean_two_batch_store(spark, docs, root)
    b0 = _assign_map(read_assignments(spark, root, "b0"))
    assert _assign_map(read_all_assignments(spark, root, version=1)) == b0
    assert _assign_map(read_assignments(spark, root, "b0", version=1)) == b0
    with pytest.raises(KeyError):
        read_assignments(spark, root, "b1", version=1)
    both = _assign_map(read_all_assignments(spark, root))
    assert set(both) > set(b0)


def test_timestamp_as_of_resolution(spark, docs, tmp_path):
    """TIMESTAMP AS OF: every commit records its wall time; a timestamp
    between two commits resolves to the earlier version, before the first
    commit raises, and the resolved snapshot reads bit-exactly."""
    import time as _time

    from multiomix_aws_emr_spark.operators.ingest import (
        manifest_at,
        version_as_of,
    )

    root = str(tmp_path / "store")
    ingest_batch(
        spark, root, docs.filter(F.col("doc_id") % 4 != 0), batch_id="b0"
    )
    t_between = _time.time()
    v1_idx = _index_set(read_index(spark, root))
    ingest_batch(
        spark, root, docs.filter(F.col("doc_id") % 4 == 0), batch_id="b1"
    )

    m1, m2 = manifest_at(root, 1), manifest_at(root, 2)
    assert 0 < m1["committed_at"] <= t_between <= m2["committed_at"]
    assert version_as_of(root, t_between) == 1
    assert version_as_of(root, _time.time()) == 2
    with pytest.raises(ValueError, match="no committed version at"):
        version_as_of(root, m1["committed_at"] - 10.0)
    assert (
        _index_set(read_index(spark, root, version=version_as_of(root, t_between)))
        == v1_idx
    )
