"""tools/localcluster_probe.py plumbing — pure tests (no JVM).

The probe's measurements are recorded in BASELINE.md; what tests can pin
cheaply is the orchestration contract the round-8 failures forced:

* each master measures in a fresh child process (the parent never
  passes a pre-launched JVM to a worker — ``--worker`` drives a single
  master per invocation), because ``spark.driver.memory`` binds at JVM
  launch only;
* the streaming variant selects the two streaming shapes at the events
  100x synth and the batch variant the three recorded batch shapes;
* the streaming worker installs a durable sink + generous stream
  timeout BEFORE any session exists (memory-sink update streams filled
  the small local-cluster driver heap and hung — BASELINE rule 8(b)).
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.localcluster_probe import _parse_args, _shapes


def test_batch_shapes_and_synth_requirements(tmp_path):
    args = _parse_args(["--out-root", str(tmp_path)])
    shapes, need = _shapes(args)
    assert [s[0] for s in shapes] == [
        "q18_1000x",
        "near_minhash_100x",
        "fs_bbha_embeddings",
    ]
    # both synth dirs missing => both demanded (bbha runs on --src as-is)
    assert need == [
        str(tmp_path / "relational_1000x"),
        str(tmp_path / "documents_100x"),
    ]


def test_streaming_shapes_use_events_100x(tmp_path):
    args = _parse_args(["--streaming", "--out-root", str(tmp_path)])
    shapes, need = _shapes(args)
    assert [s[0] for s in shapes] == ["stream_stateful_100x", "stream_session_100x"]
    ev_dir = str(tmp_path / "events_100x")
    assert need == [ev_dir]
    assert all(s[2] == ev_dir for s in shapes)
    os.makedirs(ev_dir)
    _, need2 = _shapes(args)
    assert need2 == []


def test_worker_flag_is_parsed_but_hidden():
    args = _parse_args(["--worker", "local-cluster", "--skip-synth"])
    assert args.worker == "local-cluster"
    assert args.skip_synth
    # default invocation is the parent orchestrator
    assert _parse_args([]).worker is None


def test_kill_mode_flags_and_worker_choice():
    args = _parse_args(
        ["--kill-executor", "--kill-at", "0.25", "--executors", "4",
         "--exec-cores", "8", "--exec-mem-mb", "12288"]
    )
    assert args.kill_executor
    assert args.kill_at == 0.25
    # the kill child is addressable as a worker kind of its own
    child = _parse_args(["--worker", "kill", "--skip-synth"])
    assert child.worker == "kill"
    # default stays the A/B orchestrator
    assert not _parse_args([]).kill_executor


def test_executor_pid_scan_excludes_self():
    # no executor JVMs in a pure-test process: the scan must come back
    # empty rather than matching the test runner or any stray java
    from tools.localcluster_probe import _executor_pids

    pids = _executor_pids()
    assert os.getpid() not in pids


def test_kill_shape_flag():
    args = _parse_args(["--kill-executor", "--kill-shape", "components"])
    assert args.kill_shape == "components"
    # default derives from --streaming at runtime, so the flag stays None
    assert _parse_args(["--kill-executor"]).kill_shape is None
    assert _parse_args(["--kill-executor", "--streaming"]).kill_shape is None


def test_decommission_flag_defaults_off_and_parses():
    """--decommission flips the kill probe from SIGKILL to the graceful
    SIGPWR + spark.decommission.* mitigation; default stays the hard
    kill so the recorded failure-mode numbers remain reproducible."""
    assert _parse_args([]).decommission is False
    args = _parse_args(
        ["--kill-executor", "--decommission", "--kill-at", "0.85"]
    )
    assert args.decommission is True
    assert args.kill_at == 0.85


def test_hard_kill_after_requires_decommission_context():
    """--hard-kill-after models the enforced spot reclaim: SIGPWR notice
    then SIGKILL after the window; only meaningful with --decommission
    (parsed independently, consumed only on that path)."""
    args = _parse_args(
        [
            "--kill-executor",
            "--decommission",
            "--hard-kill-after",
            "30",
        ]
    )
    assert args.hard_kill_after == 30.0
    assert _parse_args([]).hard_kill_after is None
