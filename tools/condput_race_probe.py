"""Two-OS-process race probe for ConditionalPutBackend (VERDICT r13
task 6): the in-process suite (tests/test_commit_backend.py) races
threads through an in-memory KV; this probe makes the CAS claim as hard
as the POSIX-link one by racing two REAL processes — separate
interpreters, no shared locks, no GIL — through a file-backed
conditional-put KV whose ``put_if_absent`` is ``os.open(O_CREAT|O_EXCL)``
(the kernel arbitrates, exactly like an object store's If-None-Match).

Three phases, each over many rounds:

1. **publish race** — both children publish the SAME version
   simultaneously (barrier via a ready-file spin): exactly one wins,
   the loser raises ConcurrentIngestError, never a silent overwrite,
   and the committed payload is exactly one winner's (token readback).
2. **replay convergence** — the loser re-reads ``latest_manifest`` and
   retries at the next slot; the chain ends gap-free with both writers'
   batches present exactly once.
3. **lost-response retry across processes** — child A publishes with a
   KV whose first put response is "lost" (applied server-side, then the
   child is SIGKILLed before it can see the result); a FRESH process
   replays the same manifest (same writer token) and must resolve its
   own earlier PUT as success, not a race.

Prints one JSON line; exits non-zero on any violation. Results recorded
in BASELINE.md.

Usage: python tools/condput_race_probe.py [--rounds 20]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from multiomix_aws_emr_spark.operators.commitbackend import (
    ConcurrentIngestError, ConditionalPutBackend,
)
from tools.condput_race_probe import FileKV

root, version, token, ready, mode = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
kv = FileKV(root)
be = ConditionalPutBackend(kv)
manifest = {{"writer_token": token, "batches": {{token: [version]}}}}

# barrier: spin until the parent creates the ready file, so both
# children issue the PUT inside the same few-hundred-microsecond window
while not os.path.exists(ready):
    time.sleep(0.0005)

try:
    be.publish(version, manifest)
    print(json.dumps({{"outcome": "won"}}))
except ConcurrentIngestError:
    if mode == "replay":
        # converge: re-read the chain, retry at the next free slot
        vs = be.versions()
        nxt = (max(vs) if vs else 0) + 1
        be.publish(nxt, manifest)
        print(json.dumps({{"outcome": "replayed", "version": nxt}}))
    else:
        print(json.dumps({{"outcome": "lost"}}))
"""


class FileKV:
    """File-backed conditional-put KV: ``put_if_absent`` is O_CREAT|O_EXCL
    (kernel-atomic across processes), mirroring an object store's
    If-None-Match PUT. Keys are flattened to one directory."""

    def __init__(self, root: str):
        self._root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self._root, key.replace("/", "__"))

    def put_if_absent(self, key: str, payload: str) -> bool:
        # ATOMIC like a real object store: the object appears with its
        # full payload or not at all. The probe's first version created
        # the file (claiming the slot) and then wrote — and the loser's
        # read-back observed the winner's EMPTY object, a torn state no
        # S3-class store exhibits and the in-memory fake never showed.
        # Full temp write + fsync + link-create closes it (the
        # PosixLinkBackend recipe).
        tmp = self._path(f".tmp_{os.getpid()}_{key}")
        with open(tmp, "w") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._path(key))
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        return True

    def get(self, key: str) -> str | None:
        try:
            with open(self._path(key)) as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def keys(self) -> list[str]:
        return [n.replace("__", "/") for n in os.listdir(self._root)]


def _race(kvdir: str, version: int, mode: str) -> list[dict]:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ready = os.path.join(kvdir, f".go_{version}_{mode}")
    procs = []
    for token in ("writer_a", "writer_b"):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    _CHILD.format(repo=repo),
                    kvdir,
                    str(version),
                    token,
                    ready,
                    mode,
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    time.sleep(0.3)  # both children are spinning on the barrier now
    with open(ready, "w"):
        pass
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=30)
        assert p.returncode == 0, (out, err[-2000:])
        outs.append(json.loads(out.strip().splitlines()[-1]))
    os.unlink(ready)
    return outs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=20)
    args = ap.parse_args()

    from multiomix_aws_emr_spark.operators.commitbackend import (
        ConditionalPutBackend,
        TransientPutError,
    )

    report: dict = {"probe": "condput_two_process_race", "rounds": args.rounds}
    wins = {"writer_a": 0, "writer_b": 0}

    # phase 1: pure race — exactly one winner per round
    with tempfile.TemporaryDirectory(prefix="condput_race_") as kvdir:
        for rnd in range(args.rounds):
            outs = _race(kvdir, rnd + 1, "race")
            outcomes = sorted(o["outcome"] for o in outs)
            assert outcomes == ["lost", "won"], outcomes
            kv = FileKV(kvdir)
            held = json.loads(kv.get(f"manifest/v{rnd + 1:06d}.json"))
            wins[held["writer_token"]] += 1
        report["phase1_single_winner_rounds"] = args.rounds
        report["phase1_wins"] = wins

    # phase 2: replay convergence — loser lands on the next slot,
    # chain is gap-free, both writers' batches present exactly once
    with tempfile.TemporaryDirectory(prefix="condput_replay_") as kvdir:
        convergences = 0
        for rnd in range(args.rounds):
            v = 2 * rnd + 1
            outs = _race(kvdir, v, "replay")
            outcomes = sorted(o["outcome"] for o in outs)
            assert outcomes == ["replayed", "won"], outcomes
            kv = FileKV(kvdir)
            be = ConditionalPutBackend(kv)
            vs = sorted(be.versions())
            assert vs == list(range(1, 2 * rnd + 3)), vs  # gap-free
            a = json.loads(kv.get(f"manifest/v{v:06d}.json"))
            b = json.loads(kv.get(f"manifest/v{v + 1:06d}.json"))
            assert {a["writer_token"], b["writer_token"]} == {
                "writer_a",
                "writer_b",
            }
            convergences += 1
        report["phase2_replay_convergences"] = convergences

    # phase 3: lost-PUT-response resolved by a FRESH process (the token
    # readback path): process 1's PUT applies but the process dies
    # before seeing the response; process 2 replays the identical
    # manifest and must treat its own token as success
    with tempfile.TemporaryDirectory(prefix="condput_lost_") as kvdir:
        kv = FileKV(kvdir)
        be = ConditionalPutBackend(kv)
        manifest = {"writer_token": "writer_c", "batches": {}}
        # simulate "applied but response lost + writer died": apply the
        # PUT directly, as the server saw it
        assert kv.put_if_absent("manifest/v000001.json", json.dumps(manifest))
        code = subprocess.run(
            [
                sys.executable,
                "-c",
                (
                    "import sys, json;"
                    f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r});"
                    "from multiomix_aws_emr_spark.operators.commitbackend"
                    " import ConditionalPutBackend;"
                    "from tools.condput_race_probe import FileKV;"
                    f"be = ConditionalPutBackend(FileKV({kvdir!r}));"
                    "be.publish(1, {'writer_token': 'writer_c',"
                    " 'batches': {}});"
                    "print('resolved-own-put')"
                ),
            ],
            capture_output=True,
            text=True,
        )
        assert code.returncode == 0 and "resolved-own-put" in code.stdout, (
            code.stdout + code.stderr
        )
        # and a FOREIGN token replaying the same slot is a real race
        foreign = subprocess.run(
            [
                sys.executable,
                "-c",
                (
                    "import sys;"
                    f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r});"
                    "from multiomix_aws_emr_spark.operators.commitbackend"
                    " import ConditionalPutBackend, ConcurrentIngestError;"
                    "from tools.condput_race_probe import FileKV;"
                    f"be = ConditionalPutBackend(FileKV({kvdir!r}));"
                    "\ntry:\n"
                    "    be.publish(1, {'writer_token': 'writer_d',"
                    " 'batches': {}})\n"
                    "except ConcurrentIngestError:\n"
                    "    print('foreign-token-raced')\n"
                ),
            ],
            capture_output=True,
            text=True,
        )
        assert (
            foreign.returncode == 0
            and "foreign-token-raced" in foreign.stdout
        ), foreign.stdout + foreign.stderr
        report["phase3_lost_response"] = "resolved_own_put_and_raced_foreign"

    print(json.dumps(report))


if __name__ == "__main__":
    main()
