"""Suite-level checkpoint-dir sweep audit (VERDICT r10 task 6): running
EVERY streaming/connector qid must leave zero per-run checkpoint dirs
behind on the local temp path — the cleanup contract holds wherever a
caller provisions one, not just where someone remembered to test it.

Every per-run checkpointLocation in the engine is provisioned by
``streaming.util.stream_checkpoint_dir`` and every prefix starts with
``ck_`` / ``prewarm_ck`` (grep-audited; the test would catch a new
runner that forgets cleanup as long as it keeps that convention, and
``test_prefix_convention`` pins the convention itself)."""

import os
import re
import tempfile

from multiomix_aws_emr_spark.queries import QUERIES

STREAM_QIDS = tuple(
    q for q in QUERIES if q.startswith(("stream_", "source_", "sink_"))
)

_CKPT_RE = re.compile(r"^(ck_|prewarm_ck)")


def _ckpt_entries() -> set:
    root = tempfile.gettempdir()
    return {e for e in os.listdir(root) if _CKPT_RE.match(e)}


def test_prefix_convention():
    """All stream_checkpoint_dir call sites use a ck_/prewarm_ck prefix,
    so the sweep below actually observes every per-run checkpoint."""
    import multiomix_aws_emr_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    pat = re.compile(r"stream_checkpoint_dir\(\s*spark,\s*f?\"([^\"{]+)")
    prefixes = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if f.endswith(".py"):
                with open(os.path.join(root, f)) as fh:
                    prefixes += pat.findall(fh.read())
    assert prefixes, "no stream_checkpoint_dir call sites found"
    for p in prefixes:
        assert _CKPT_RE.match(p), f"unaudited checkpoint prefix: {p}"


def test_durable_root_swept_after_run(spark, sf_dir, monkeypatch, tmp_path):
    """End-to-end through a real bounded runner: with a durable
    checkpoint root (URI form), the per-run subdir is deleted on success
    via the Hadoop FileSystem sweep — the fleet-run analog of the local
    temp-dir cleanup (ADVICE r10)."""
    root = tmp_path / "ckroot"
    root.mkdir()
    monkeypatch.setenv("SPARK_GRAFT_STREAM_CKPT_DIR", f"file://{root}")
    df = QUERIES["stream_tumbling"](spark, sf_dir)
    assert df.count() > 0
    leftovers = [p.name for p in root.iterdir()]
    assert not leftovers, f"durable-root checkpoint not swept: {leftovers}"


def test_no_checkpoint_dirs_accumulate(spark, sf_dir):
    """Run the full streaming surface and assert the temp path holds no
    new ck_* leftovers afterwards (no accumulation on the local path)."""
    before = _ckpt_entries()
    assert len(STREAM_QIDS) >= 15
    for qid in STREAM_QIDS:
        df = QUERIES[qid](spark, sf_dir)
        assert df.count() >= 0, qid
    leftovers = _ckpt_entries() - before
    assert not leftovers, f"checkpoint dirs leaked: {sorted(leftovers)}"
