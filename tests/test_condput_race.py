"""Pytest wrapper over the two-OS-process conditional-put race
(tools/condput_race_probe.py, VERDICT r13 task 6): keeps the
cross-process CAS claim continuously verified — separate interpreters,
kernel-arbitrated put_if_absent, no shared locks — at a round count
small enough for the suite (the full 20-round sweep is the probe's
job; results in BASELINE.md)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_race_phases():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "condput_race_probe.py"),
            "--rounds",
            "3",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["phase1_single_winner_rounds"] == 3
    assert sum(report["phase1_wins"].values()) == 3
    assert report["phase2_replay_convergences"] == 3
    assert (
        report["phase3_lost_response"]
        == "resolved_own_put_and_raced_foreign"
    )
