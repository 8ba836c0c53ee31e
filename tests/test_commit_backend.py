"""The conditional-put commit backend (VERDICT r12 task 3): the same
concurrent-writer + replay + crash contracts the POSIX-link store passes
must hold when the manifest chain routes through an S3-style
put-if-absent KV — including the object-store-only failure the POSIX
path never sees, a PUT whose response is lost after the server applied
it (resolved by writer-token read-back, never a blind retry that would
misreport success as a race or vice versa)."""

import threading

import pytest
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.operators.commitbackend import (
    ConcurrentIngestError,
    ConditionalPutBackend,
    InMemoryConditionalPut,
    TransientPutError,
    backend_for,
    set_commit_backend,
)
from multiomix_aws_emr_spark.operators.dedup import band_index, banded_buckets
from multiomix_aws_emr_spark.operators.ingest import (
    _commit_manifest,
    ingest_batch,
    latest_manifest,
    read_index,
    retract_batch,
    sweep_orphans,
)
from multiomix_aws_emr_spark.sources.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select("doc_id", "text")


@pytest.fixture
def kv_store(tmp_path):
    """A local-data store whose MANIFEST protocol runs over the fake
    conditional-put KV — the S3 deployment shape (Spark writes parquet
    to writer-unique dirs; commits go through If-None-Match)."""
    root = str(tmp_path / "kvstore")
    kv = InMemoryConditionalPut()
    set_commit_backend(root, ConditionalPutBackend(kv))
    yield root, kv
    set_commit_backend(root, None)


def _index_set(df):
    return {(r.band, r.bucket, r.rep) for r in df.collect()}


def test_unregistered_object_store_root_still_refused():
    with pytest.raises(ValueError, match="conditional-put"):
        backend_for("obj://bucket/store")


def test_registered_backend_governs_root():
    kv = InMemoryConditionalPut()
    be = ConditionalPutBackend(kv)
    set_commit_backend("obj://bucket/store", be)
    try:
        assert backend_for("obj://bucket/store/") is be
    finally:
        set_commit_backend("obj://bucket/store", None)


def test_ingest_and_read_over_conditional_put(spark, docs, kv_store):
    """Full two-batch lifecycle with the manifest chain in the KV: the
    committed index equals the from-scratch rebuild, and no manifest
    files exist on the filesystem (the KV owns the chain)."""
    import glob
    import os

    root, kv = kv_store
    ingest_batch(
        spark, root, docs.filter(F.col("doc_id") % 4 != 0), batch_id="b0"
    )
    ingest_batch(
        spark, root, docs.filter(F.col("doc_id") % 4 == 0), batch_id="b1"
    )
    ver, m = latest_manifest(root)
    assert ver == 2 and set(m["batches"]) == {"b0", "b1"}
    banded = banded_buckets(docs, text_col="text", id_col="doc_id", portable=True)
    assert _index_set(read_index(spark, root)) == _index_set(
        band_index(banded, id_col="doc_id")
    )
    assert len(kv.keys()) == 2
    assert not glob.glob(os.path.join(root, "manifest", "*.json"))


def test_replay_is_noop_over_conditional_put(spark, docs, kv_store):
    root, kv = kv_store
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    first = {r.doc_id: r.rep_id for r in ingest_batch(spark, root, batch, batch_id="b0").collect()}
    puts_before = kv.puts_attempted
    again = {r.doc_id: r.rep_id for r in ingest_batch(spark, root, batch, batch_id="b0").collect()}
    assert again == first
    assert kv.puts_attempted == puts_before  # no second commit attempted
    assert latest_manifest(root)[0] == 1


def test_lost_put_response_resolved_by_token_readback(kv_store):
    """The S3 timeout case: the server applied the PUT but the response
    was lost. The backend must read back, recognize its own writer
    token, and report success — not raise a phantom race."""
    root, kv = kv_store
    kv.lose_next_put_response = True
    _commit_manifest(root, 1, {"batches": {}})
    ver, m = latest_manifest(root)
    assert ver == 1 and "writer_token" in m


def test_lost_request_before_apply_retries_to_success(kv_store):
    root, kv = kv_store
    kv.fail_next_put_before_apply = True
    _commit_manifest(root, 1, {"batches": {}})
    assert latest_manifest(root)[0] == 1
    assert kv.puts_attempted == 2  # one lost, one landed


def test_concurrent_writers_race_loudly(kv_store):
    """Two writers claim the same version slot: exactly one wins, the
    loser gets ConcurrentIngestError — never a silent overwrite."""
    root, kv = kv_store
    results = {}

    def claim(name):
        try:
            _commit_manifest(root, 1, {"batches": {}, "who": name})
            results[name] = "won"
        except ConcurrentIngestError:
            results[name] = "lost"

    threads = [threading.Thread(target=claim, args=(n,)) for n in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results.values()) == ["lost", "won"]
    winner = [n for n, r in results.items() if r == "won"][0]
    assert latest_manifest(root)[1]["who"] == winner


def test_retract_over_conditional_put(spark, docs, kv_store):
    root, _ = kv_store
    ingest_batch(spark, root, docs, batch_id="b0")
    victims = docs.select("doc_id").limit(5)
    retract_batch(spark, root, victims, op_id="forget-1")
    ver, m = latest_manifest(root)
    assert ver == 2 and m["batches"]["forget-1"]["kind"] == "retract"
    gone = {r.doc_id for r in victims.collect()}
    assert not gone & {r.rep for r in read_index(spark, root).collect()}


def test_crash_before_commit_converges(spark, docs, kv_store, monkeypatch):
    """A writer dying after staging but before the KV commit leaves only
    orphan dirs; the re-run stages fresh and commits — same convergence
    contract as the POSIX kill probes."""
    root, kv = kv_store
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    monkeypatch.setenv("SPARK_GRAFT_INGEST_CRASH_POINT", "before_commit")
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_batch(spark, root, batch, batch_id="b0")
    monkeypatch.delenv("SPARK_GRAFT_INGEST_CRASH_POINT")
    assert latest_manifest(root)[0] == 0  # nothing committed
    got = ingest_batch(spark, root, batch, batch_id="b0")
    assert latest_manifest(root)[0] == 1
    assert got.count() == batch.count()
    swept = sweep_orphans(root)
    assert any("index_v1" in s or "batches" in s for s in swept)
    # the committed version's dirs survived the sweep
    assert read_index(spark, root).count() > 0


def test_publish_gives_up_after_bounded_transient_failures(kv_store):
    root, kv = kv_store

    class AlwaysLosing(InMemoryConditionalPut):
        def put_if_absent(self, key, payload):
            self.puts_attempted += 1
            raise TransientPutError("request lost")

    set_commit_backend(root, ConditionalPutBackend(AlwaysLosing()))
    try:
        with pytest.raises(TransientPutError, match="did not converge"):
            _commit_manifest(root, 1, {"batches": {}})
    finally:
        set_commit_backend(root, None)


def test_latest_manifest_refuses_listed_but_unreadable_version():
    """ADVICE r13: a KV that LISTS a version it cannot yet serve
    (eventual consistency / broken caller backend) is a protocol
    violation — latest_manifest raises a named ValueError instead of
    returning (version, None) into a downstream TypeError."""

    class ListsMoreThanItServes(InMemoryConditionalPut):
        def keys(self):
            return super().keys() + ["manifest/v000007.json"]

    root = "obj://bucket/phantom_store"
    set_commit_backend(root, ConditionalPutBackend(ListsMoreThanItServes()))
    try:
        with pytest.raises(ValueError, match="listed version 7 is unreadable"):
            latest_manifest(root)
    finally:
        set_commit_backend(root, None)


def test_read_tolerates_transiently_torn_object_then_raises_protocol():
    """r14 (the read-side twin of publish()'s unparseable-read-back
    branch): a torn/partial manifest object reaching the READER path is
    re-read — a naive create-then-write KV that completes the write
    mid-retry resolves to the real manifest — and a PERSISTENTLY
    unparseable object raises the protocol's words, never a raw
    JSONDecodeError."""
    import json as _json

    class TornThenWhole(InMemoryConditionalPut):
        def __init__(self, whole_after: int):
            super().__init__()
            self.gets = 0
            self.whole_after = whole_after

        def get(self, key):
            payload = super().get(key)
            if payload is None:
                return None
            self.gets += 1
            return payload if self.gets > self.whole_after else payload[:5]

    kv = TornThenWhole(whole_after=2)
    backend = ConditionalPutBackend(kv)
    backend.publish(1, {"batches": {"b": 1}})
    got = backend.read(1)
    assert got["batches"] == {"b": 1}  # healed within the retry budget

    kv2 = TornThenWhole(whole_after=10**9)  # never heals
    backend2 = ConditionalPutBackend(kv2)
    backend2.publish(1, {"batches": {}})
    with pytest.raises(ValueError, match="stayed unparseable"):
        backend2.read(1)
    # absent versions still read as None, not an error
    assert backend2.read(99) is None
