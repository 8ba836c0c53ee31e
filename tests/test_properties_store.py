"""Property-based tests for the transactional dedup store (late r12).

The store's contract collapses to one sentence: WHATEVER the batch
partition, the committed chain is indistinguishable from from-scratch
rebuilds over the corresponding corpus prefixes — and every derived
surface (time travel, version diff, retraction, replay) must agree with
that rebuild view. Hypothesis generates corpora with duplicate texts,
random batch assignments, and random retraction sets, and checks the
whole family on each example:

- after each committed ingest, ``read_index(version=v)`` equals
  ``band_index`` over exactly the docs ingested so far (time travel ==
  prefix rebuild; empty batches burn no version and shift no prefix);
- ``diff_versions(a, b)`` applied as a patch to snapshot ``a``
  reproduces snapshot ``b``, for the full span and every adjacent pair;
- replaying a committed batch returns its stored rows and commits
  nothing;
- retracting a random subset (often including bucket reps) yields the
  index of a from-scratch build over the survivors, while time travel
  still serves the pre-retraction snapshot bit-exactly.
"""

import tempfile
import time

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multiomix_aws_emr_spark.operators.dedup import band_index, banded_buckets
from multiomix_aws_emr_spark.operators.ingest import (
    diff_versions,
    ingest_batch,
    latest_manifest,
    read_index,
    retract_batch,
)

_settings = settings(
    max_examples=4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_PARAMS = {"num_hashes": 8, "bands": 2, "shingle_words": 2, "portable": False}

_VOCAB = ("alpha", "beta", "gamma", "delta", "epsilon")

_corpus = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=2, max_size=5).map(" ".join),
    min_size=2,
    max_size=8,
)


def _index_set(df):
    return {(r.band, r.bucket, r.rep) for r in df.collect()}


def _rebuild(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return _index_set(
        band_index(
            banded_buckets(df, text_col="text", id_col="doc_id", **_PARAMS),
            id_col="doc_id",
        )
    )


def _patch(base: set, diff_rows) -> set:
    touched = {(r.band, r.bucket) for r in diff_rows}
    return {t for t in base if (t[0], t[1]) not in touched} | {
        (r.band, r.bucket, r.rep_to) for r in diff_rows if r.rep_to is not None
    }


@_settings
@given(data=st.data())
def test_store_chain_equals_prefix_rebuilds(spark, data):
    texts = data.draw(_corpus)
    # duplicate every text so buckets are contested, then scatter the
    # docs over up to 3 batches (some possibly empty)
    rows = [(i, t) for i, t in enumerate(texts + texts)]
    batch_of = data.draw(
        st.lists(
            st.integers(0, 2), min_size=len(rows), max_size=len(rows)
        )
    )
    root = tempfile.mkdtemp(prefix="prop_store_")

    ingested: list = []
    snapshots: dict[int, set] = {}
    for b in range(3):
        batch_rows = [r for r, g in zip(rows, batch_of) if g == b]
        df = spark.createDataFrame(batch_rows, "doc_id long, text string")
        ver_before = latest_manifest(root)[0]
        out = ingest_batch(
            spark, root, df, batch_id=f"b{b}", **_PARAMS
        ).collect()
        ver_after = latest_manifest(root)[0]
        assert {r.doc_id for r in out} == {i for i, _ in batch_rows}
        if not batch_rows:
            assert ver_after == ver_before  # empty batches burn no version
            continue
        assert ver_after == ver_before + 1
        ingested += batch_rows
        snapshots[ver_after] = _rebuild(spark, ingested)
        # replay: stored rows back, no new version
        replay = ingest_batch(
            spark, root, df, batch_id=f"b{b}", **_PARAMS
        ).collect()
        assert {(r.doc_id, r.rep_id) for r in replay} == {
            (r.doc_id, r.rep_id) for r in out
        }
        assert latest_manifest(root)[0] == ver_after

    if not snapshots:
        return
    last = max(snapshots)
    # time travel == prefix rebuild at every committed version
    for v, expect in snapshots.items():
        assert _index_set(read_index(spark, root, version=v)) == expect

    # TIMESTAMP AS OF inverts the commit clock at every committed
    # version: each commit's own wall time resolves to that version, a
    # timestamp past the newest resolves to it, and one before the first
    # commit raises
    from multiomix_aws_emr_spark.operators.ingest import (
        manifest_at,
        version_as_of,
    )

    for v in snapshots:
        assert version_as_of(root, manifest_at(root, v)["committed_at"]) == v
    assert version_as_of(root, time.time() + 1.0) == last
    with pytest.raises(ValueError, match="no committed version"):
        version_as_of(
            root, manifest_at(root, min(snapshots))["committed_at"] - 1.0
        )

    # diff is a faithful patch across the full span and adjacent pairs
    versions = sorted(snapshots)
    spans = {(versions[0], last)} | {
        (a, b) for a, b in zip(versions, versions[1:])
    }
    for a, b in spans:
        d = diff_versions(spark, root, a, b).collect()
        assert _patch(snapshots[a], d) == snapshots[b]

    # retraction == rebuild over survivors; travel still serves history
    victim_ids = {
        i for i, _ in rows if data.draw(st.booleans(), label=f"kill{i}")
    } & {i for i, _ in ingested}
    if victim_ids:
        victims = spark.createDataFrame(
            [(i,) for i in victim_ids], "doc_id BIGINT"
        )
        retract_batch(spark, root, victims, op_id="prop-retract")
        survivors = [r for r in ingested if r[0] not in victim_ids]
        assert _index_set(read_index(spark, root)) == _rebuild(
            spark, survivors
        )
        assert _index_set(read_index(spark, root, version=last)) == snapshots[
            last
        ]


@_settings
@given(data=st.data())
def test_compaction_preserves_asof_reads_and_diffs(spark, data):
    """VERDICT r12 task 6: the chain contract EXTENDED ACROSS MAINTENANCE.
    Compacting per-batch assignment dirs into one archive commits a new
    version but must change no observable state: every as-of index read
    inside the retention window is bit-identical before and after
    compaction + vacuum, every committed batch's assignments still read
    back (now archive-backed), diff across the compaction boundary is
    empty (compaction changes durability layout, not decisions), and a
    diff SPANNING the boundary still patches v_from into v_to."""
    from multiomix_aws_emr_spark.operators.ingest import (
        compact_store,
        read_assignments,
        sweep_orphans,
    )

    texts = data.draw(_corpus)
    rows = [(i, t) for i, t in enumerate(texts + texts)]
    # even/odd split: both batches non-empty (len(rows) >= 4), so
    # compaction always has >= 2 loose dirs to collapse
    batches = {
        "even": [r for r in rows if r[0] % 2 == 0],
        "odd": [r for r in rows if r[0] % 2 == 1],
    }
    root = tempfile.mkdtemp(prefix="prop_compact_")

    ingested: list = []
    snapshots: dict[int, set] = {}
    stored_assigns: dict[str, set] = {}
    for bid, batch_rows in batches.items():
        df = spark.createDataFrame(batch_rows, "doc_id long, text string")
        out = ingest_batch(spark, root, df, batch_id=bid, **_PARAMS)
        stored_assigns[bid] = {(r.doc_id, r.rep_id) for r in out.collect()}
        ingested += batch_rows
        snapshots[latest_manifest(root)[0]] = _rebuild(spark, ingested)

    last_ingest = max(snapshots)
    assert compact_store(spark, root)
    ver_compact = latest_manifest(root)[0]
    assert ver_compact == last_ingest + 1

    # vacuum with a window covering every committed version: nothing a
    # retained manifest references may disappear
    sweep_orphans(root, retain_versions=ver_compact)

    # as-of reads inside retention are unchanged by compaction + vacuum
    for v, expect in snapshots.items():
        assert _index_set(read_index(spark, root, version=v)) == expect
    assert _index_set(read_index(spark, root)) == snapshots[last_ingest]

    # batch reads survive, now archive-backed
    for bid, expect in stored_assigns.items():
        got = {
            (r.doc_id, r.rep_id)
            for r in read_assignments(spark, root, bid).collect()
        }
        assert got == expect

    # replay of an archived batch is still a no-op returning stored rows
    bid, batch_rows = next(iter(batches.items()))
    df = spark.createDataFrame(batch_rows, "doc_id long, text string")
    replay = ingest_batch(spark, root, df, batch_id=bid, **_PARAMS)
    assert {(r.doc_id, r.rep_id) for r in replay.collect()} == stored_assigns[bid]
    assert latest_manifest(root)[0] == ver_compact

    # the compaction boundary: zero decision changes, and spanning diffs
    # still patch (v1 -> ver_compact == v1 -> last_ingest)
    assert diff_versions(spark, root, last_ingest, ver_compact).count() == 0
    first = min(snapshots)
    d = diff_versions(spark, root, first, ver_compact).collect()
    assert _patch(snapshots[first], d) == snapshots[last_ingest]

    # past the window the janitor may reclaim: with retain 0 only the
    # newest version's data is guaranteed, but archived batch reads keep
    # working (the archive is referenced by the newest manifest)
    sweep_orphans(root, retain_versions=0)
    for bid, expect in stored_assigns.items():
        got = {
            (r.doc_id, r.rep_id)
            for r in read_assignments(spark, root, bid).collect()
        }
        assert got == expect
