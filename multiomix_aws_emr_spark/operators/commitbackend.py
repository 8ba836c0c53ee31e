"""Pluggable manifest-commit backends for the transactional dedup store
(operators/ingest.py) — VERDICT r12 task 3.

The store's safety reduces to ONE primitive: atomically claim manifest
version slot ``v{N}`` such that exactly one writer wins and every loser
learns it lost (never a silent overwrite). Everything else — staged
parquet under writer-unique dirs, replay idempotence, vacuum — is
backend-independent, because data dirs are only ever CREATED at fresh
names (safe on any store, including S3, whose writers never rename) and
readers follow only the committed manifest.

Two implementations of that primitive:

- :class:`PosixLinkBackend` — ``os.link`` create-if-absent over a
  POSIX-like filesystem (local, NFS, HDFS-via-mount). The default; byte
  -for-byte the protocol shipped in r12.
- :class:`ConditionalPutBackend` — compare-and-set over any KV offering
  ``put_if_absent`` (S3 ``If-None-Match: *``, GCS ``x-goog-if-
  generation-match: 0``, Azure ``If-None-Match: *``). Handles the
  object-store subtlety POSIX link never sees: a PUT whose RESPONSE is
  lost (timeout after the server applied it). The payload embeds the
  writer's attempt token, so a retry that finds the slot taken reads it
  back — its own token means its earlier PUT landed (success), a
  foreign token means a real race (:class:`ConcurrentIngestError`).

The store resolves a backend per root via :func:`backend_for`:
registered roots (``set_commit_backend``) win, plain paths default to
POSIX link, and a ``://`` root WITHOUT a registered backend is still
refused loudly — unchanged honesty, but now the refusal names a
shippable remedy that exists in-tree and passes the same concurrent-
writer / replay / kill suite (tests/test_commit_backend.py).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid


class ConcurrentIngestError(RuntimeError):
    """Another writer committed the version this transaction targeted.
    Nothing was lost: re-read the store and retry the operation."""


class CommitBackend:
    """Manifest-chain storage for one store root. Implementations must
    make :meth:`publish` atomic-or-loud: exactly one writer per version
    slot, losers raise :class:`ConcurrentIngestError`."""

    def publish(self, version: int, manifest: dict) -> None:
        raise NotImplementedError

    def read(self, version: int) -> dict | None:
        """The committed manifest at an exact version, or None."""
        raise NotImplementedError

    def versions(self) -> list[int]:
        """All committed version numbers (unordered gaps possible — a
        race loser's slot is simply never filled)."""
        raise NotImplementedError

    def sweep_tmp(self) -> list[str]:
        """Remove commit-protocol residue (e.g. a hard kill between a
        temp manifest's create and its link); returns swept names."""
        return []


class PosixLinkBackend(CommitBackend):
    """The r12 protocol: full temp write + fsync, then ``os.link`` to
    ``v{N:06d}.json`` — create-if-absent is the optimistic-concurrency
    claim on the slot. Requires POSIX link semantics at the root."""

    def __init__(self, root: str):
        self._dir = os.path.join(root, "manifest")

    def publish(self, version: int, manifest: dict) -> None:
        os.makedirs(self._dir, exist_ok=True)
        tmp = os.path.join(self._dir, f".tmp_{uuid.uuid4().hex[:12]}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        final = os.path.join(self._dir, f"v{version:06d}.json")
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise ConcurrentIngestError(
                f"version {version} was committed by another writer while "
                "this transaction staged; re-read the store and retry"
            ) from None
        finally:
            os.unlink(tmp)

    def read(self, version: int) -> dict | None:
        path = os.path.join(self._dir, f"v{version:06d}.json")
        try:
            with open(path) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def versions(self) -> list[int]:
        if not os.path.isdir(self._dir):
            return []
        out = []
        for name in os.listdir(self._dir):
            m = re.fullmatch(r"v(\d{6,})\.json", name)
            if m:
                out.append(int(m.group(1)))
        return out

    def sweep_tmp(self) -> list[str]:
        swept = []
        if not os.path.isdir(self._dir):
            return swept
        for entry in os.listdir(self._dir):
            if entry.startswith(".tmp_"):
                try:
                    os.unlink(os.path.join(self._dir, entry))
                    swept.append(os.path.join("manifest", entry))
                except OSError:
                    pass
        return swept


class TransientPutError(RuntimeError):
    """The KV applied (or may have applied) the PUT but the response was
    lost — the S3-timeout case. The caller must read back to learn the
    outcome; it must NOT assume failure."""


class ConditionalPutBackend(CommitBackend):
    """Compare-and-set commits over a conditional-put KV.

    ``kv`` needs three methods (the exact surface S3/GCS/Azure offer):

    - ``put_if_absent(key, payload: str) -> bool`` — atomically create;
      False when the key exists; may raise :class:`TransientPutError`
      when the outcome is unknown (response lost).
    - ``get(key) -> str | None``
    - ``keys() -> list[str]``

    Publish resolves the lost-response ambiguity by READ-BACK, not
    retry-blind: the manifest's ``writer_token`` (stamped by the store's
    commit path) identifies this attempt, so finding the slot held by
    our own token is success (our earlier PUT landed) and a foreign
    token is a real lost race. ``put_if_absent`` returning False without
    a token match is always a loss — conditional put never tears."""

    MAX_ATTEMPTS = 4
    # pause between torn-object re-reads (ADVICE r15): against a real KV
    # a mid-write torn object is almost certainly still torn microseconds
    # later, so an immediate re-read mostly satisfies test doubles — a
    # small fixed delay gives the bounded retry a realistic chance of
    # observing the completed write. Tests that inject torn objects set
    # this to 0 to stay fast.
    RETRY_SLEEP_SEC = 0.02

    def __init__(self, kv):
        self._kv = kv

    @staticmethod
    def _key(version: int) -> str:
        return f"manifest/v{version:06d}.json"

    def publish(self, version: int, manifest: dict) -> None:
        key = self._key(version)
        # the token is what makes a lost-response retry distinguishable
        # from a real race — a direct caller that didn't stamp one gets
        # one here, so read-back can never misreport its own success
        if not manifest.get("writer_token"):
            manifest = {**manifest, "writer_token": uuid.uuid4().hex}
        payload = json.dumps(manifest)
        token = manifest["writer_token"]
        for attempt in range(self.MAX_ATTEMPTS):
            if attempt and self.RETRY_SLEEP_SEC:
                time.sleep(self.RETRY_SLEEP_SEC)
            try:
                if self._kv.put_if_absent(key, payload):
                    return
            except TransientPutError:
                pass  # outcome unknown -> read back below
            existing = self._kv.get(key)
            if existing is None:
                continue  # transient loss before the server applied it
            try:
                held = json.loads(existing).get("writer_token")
            except ValueError:
                # an unparseable read-back (torn/partial object) is a KV
                # atomicity violation no S3-class store exhibits — but
                # the two-process race probe (tools/condput_race_probe)
                # produced exactly this against a naive create-then-write
                # fake, so treat it like a transient and re-read rather
                # than crash mid-commit; MAX_ATTEMPTS still bounds it
                continue
            if held == token:
                return  # our earlier PUT landed; the retry is a no-op
            raise ConcurrentIngestError(
                f"version {version} was committed by another writer while "
                "this transaction staged; re-read the store and retry"
            )
        raise TransientPutError(
            f"commit of version {version} did not converge in "
            f"{self.MAX_ATTEMPTS} attempts (KV kept losing responses "
            "without materializing the object)"
        )

    def read(self, version: int) -> dict | None:
        # the same torn/partial object publish() tolerates (a naive
        # create-then-write KV read mid-write — found by the two-process
        # race probe) can reach the READER path too: re-read a bounded
        # number of times, then raise the protocol's words instead of
        # letting a raw JSONDecodeError escape (r14; the read-side twin
        # of publish()'s unparseable-read-back branch)
        last_err: Exception | None = None
        for attempt in range(self.MAX_ATTEMPTS):
            if attempt and self.RETRY_SLEEP_SEC:
                time.sleep(self.RETRY_SLEEP_SEC)
            payload = self._kv.get(self._key(version))
            if payload is None:
                return None
            try:
                return json.loads(payload)
            except ValueError as exc:
                last_err = exc
        raise ValueError(
            f"manifest version {version} is unreadable: the object "
            f"exists but stayed unparseable across {self.MAX_ATTEMPTS} "
            "reads (torn write or real corruption — published manifests "
            "are complete by protocol)"
        ) from last_err

    def versions(self) -> list[int]:
        out = []
        for key in self._kv.keys():
            m = re.fullmatch(r"manifest/v(\d{6,})\.json", key)
            if m:
                out.append(int(m.group(1)))
        return out


class InMemoryConditionalPut:
    """Test double for an S3-style conditional-put KV with FAULT
    INJECTION: ``lose_next_put_response`` makes the next put apply
    server-side but raise :class:`TransientPutError` (the lost-PUT
    retry case); ``fail_next_put_before_apply`` loses the request
    before it applies. Thread-safe (one lock around the dict) — the
    concurrency tests race real threads through it."""

    def __init__(self):
        import threading

        self._data: dict[str, str] = {}
        self._lock = threading.Lock()
        self.lose_next_put_response = False
        self.fail_next_put_before_apply = False
        self.puts_attempted = 0

    def put_if_absent(self, key: str, payload: str) -> bool:
        with self._lock:
            self.puts_attempted += 1
            if self.fail_next_put_before_apply:
                self.fail_next_put_before_apply = False
                raise TransientPutError("request lost before apply")
            if key in self._data:
                return False
            self._data[key] = payload
            if self.lose_next_put_response:
                self.lose_next_put_response = False
                raise TransientPutError("response lost after apply")
            return True

    def get(self, key: str) -> str | None:
        with self._lock:
            return self._data.get(key)

    def keys(self) -> list[str]:
        with self._lock:
            return list(self._data)


_BACKENDS: dict[str, CommitBackend] = {}


def set_commit_backend(root: str, backend: CommitBackend | None) -> None:
    """Attach a commit backend to a store root (None detaches). Data
    dirs remain plain paths written by Spark; only the MANIFEST protocol
    routes through the backend — which is exactly the S3 deployment
    shape: parquet via the object-store committer (writer-unique dirs,
    no renames), commits via conditional put."""
    key = root.rstrip("/")
    if backend is None:
        _BACKENDS.pop(key, None)
    else:
        _BACKENDS[key] = backend


def backend_for(root: str) -> CommitBackend:
    """The commit backend governing ``root``: an explicitly registered
    one wins; plain paths default to POSIX link; a ``://`` root without
    a registration is refused loudly (committing it through os.link
    would be silently unsafe)."""
    key = root.rstrip("/")
    if key in _BACKENDS:
        return _BACKENDS[key]
    if "://" in root:
        raise ValueError(
            "the dedup store's default commit primitive is POSIX "
            "link-create; an object-store root needs a conditional-put "
            "backend — set_commit_backend(root, ConditionalPutBackend("
            f"kv)) over the store's If-None-Match API (got {root!r})"
        )
    return PosixLinkBackend(key)
