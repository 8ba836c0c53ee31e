"""Job control plane: scheduling, status, cancellation, spec building.

Re-founds the reference's Flask + boto3 layer (`src/app.py`, `src/emr.py`,
`src/validations.py`) with zero extra dependencies:

- request validation (R39, `src/validations.py:4-18`): required keys plus
  an ``app-name`` entrypoint argument;
- entrypoint-arg marshalling (R40, `src/emr.py:156-164`):
  ``[{"name","value"},…] -> ["--name", "value", …]``;
- spark-submit conf builder (R41, `src/emr.py:105-137`): the 13-conf
  string template, driven by a plain mapping instead of 20 env vars (D9);
- random job-name generator (R42, `src/emr.py:193-195`):
  ``<prefix>-<algorithm>-<6 lowercase>-<6 digits>``, seedable;
- job-state projection (D8, `src/app.py:85-92`):
  ``{id, createdAt, finishedAt, name, state, stateDetails}``.

Backends are pluggable: :class:`LocalBackend` executes the job callable in
a thread (real, testable end-to-end);
:class:`multiomix_aws_emr_spark.service.emr.EmrContainersBackend` speaks
the reference's ``emr-containers`` API (start_job_run / describe_job_run
/ cancel_job_run, `src/emr.py:17-102`) through an injected boto3-shaped
client behind this same interface.
"""

from __future__ import annotations

import random
import string
import threading
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Callable, Optional

#: Supported algorithms (`src/emr.py:10-14`; BLIND_SEARCH is a declared
#: TODO in the reference — kept as an enum value, not implemented there
#: either, SURVEY.md §7.6).
ALGORITHMS = {"BLIND_SEARCH": 0, "BBHA": 1}

_REQUIRED_KEYS = ("name", "algorithm", "entrypoint_arguments")


def validate_schedule_request(body: dict) -> tuple[bool, str]:
    """R39: required keys present + entrypoint args contain ``app-name``
    (`src/validations.py:12-18`)."""
    if not isinstance(body, dict):
        return False, "body must be a JSON object"
    for key in _REQUIRED_KEYS:
        if key not in body:
            return False, f"missing required key: {key}"
    args = body["entrypoint_arguments"]
    if not isinstance(args, list):
        return False, "entrypoint_arguments must be a list"
    if not any(a.get("name") == "app-name" for a in args if isinstance(a, dict)):
        return False, "entrypoint_arguments must include app-name"
    return True, ""


def marshal_entrypoint_args(
    args: list[dict], prefix: str = "--"
) -> list[str]:
    """R40: ``[{"name": n, "value": v}, …] -> [prefix+n, str(v), …]``
    (`src/emr.py:156-164`)."""
    out: list[str] = []
    for a in args:
        out.append(f"{prefix}{a['name']}")
        out.append(str(a["value"]))
    return out


_DEFAULT_CONF = {
    "spark.driver.cores": "1",
    "spark.driver.memory": "4g",
    "spark.driver.maxResultSize": "2g",
    "spark.executor.instances": "3",
    "spark.executor.cores": "1",
    "spark.executor.memory": "4g",
    "spark.executor.heartbeatInterval": "600s",
    "spark.network.timeout": "2400s",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.shuffle.partitions": "auto",
}


def spark_submit_params(overrides: Optional[dict] = None) -> str:
    """R41: the spark-submit conf string (`src/emr.py:105-137`), defaults
    carrying the reference's operational envelope (`Dockerfile:9-17`) plus
    this engine's SQL conf baseline. ``overrides`` is the engine IR analog
    of the reference's env-var dict (D9)."""
    conf = dict(_DEFAULT_CONF)
    if overrides:
        conf.update({str(k): str(v) for k, v in overrides.items()})
    return " ".join(f"--conf {k}={v}" for k, v in sorted(conf.items()))


def random_job_name(
    algorithm: str, prefix: str = "engine", rng: Optional[random.Random] = None
) -> str:
    """R42 (`src/emr.py:193-195`): ``<prefix>-<algo>-<6 lowercase>-<6
    digits>``; seedable for tests."""
    rng = rng or random.Random()
    letters = "".join(rng.choice(string.ascii_lowercase) for _ in range(6))
    digits = "".join(rng.choice(string.digits) for _ in range(6))
    return f"{prefix}-{algorithm.lower().replace('_', '-')}-{letters}-{digits}"


def _now() -> str:
    return datetime.now(timezone.utc).isoformat()


@dataclass
class JobRecord:
    id: str
    name: str
    state: str = "PENDING"
    state_details: str = ""
    created_at: str = field(default_factory=_now)
    finished_at: Optional[str] = None

    def projection(self) -> dict:
        """D8 (`src/app.py:85-92`)."""
        return {
            "id": self.id,
            "createdAt": self.created_at,
            "finishedAt": self.finished_at,
            "name": self.name,
            "state": self.state,
            "stateDetails": self.state_details,
        }


class LocalBackend:
    """In-process job execution: the runner callable gets the validated
    spec; states follow the EMR lifecycle names the reference relays
    (PENDING -> RUNNING -> COMPLETED/FAILED/CANCELLED)."""

    def __init__(self, runner: Callable[[dict], object]):
        self._runner = runner
        self._jobs: dict[str, JobRecord] = {}
        self._threads: dict[str, threading.Thread] = {}
        self._cancelled: set[str] = set()
        self._lock = threading.Lock()

    def schedule(self, spec: dict) -> str:
        job_id = uuid.uuid4().hex[:12]
        record = JobRecord(id=job_id, name=spec["name"])
        with self._lock:
            self._jobs[job_id] = record

        def run():
            with self._lock:
                if job_id in self._cancelled:
                    return
                record.state = "RUNNING"
            try:
                self._runner(spec)
                new_state, details = "COMPLETED", ""
            except Exception as exc:  # job failure -> FAILED + details
                new_state, details = "FAILED", f"{type(exc).__name__}: {exc}"
            with self._lock:
                if job_id not in self._cancelled:
                    record.state = new_state
                    record.state_details = details
                record.finished_at = _now()

        thread = threading.Thread(target=run, daemon=True)
        self._threads[job_id] = thread
        thread.start()
        return job_id

    def get(self, job_id: str) -> Optional[JobRecord]:
        with self._lock:
            return self._jobs.get(job_id)

    def cancel(self, job_id: str) -> bool:
        with self._lock:
            record = self._jobs.get(job_id)
            if record is None or record.finished_at is not None:
                return False
            self._cancelled.add(job_id)
            record.state = "CANCELLED"
            record.finished_at = _now()
            return True

    def wait(self, job_id: str, timeout: float = 30.0) -> None:
        thread = self._threads.get(job_id)
        if thread is not None:
            thread.join(timeout)


class JobService:
    """Validation + backend + completion notification — the semantics of
    the reference's schedule/get/cancel/relay endpoints
    (`src/app.py:42-152`, R35-R38). ``notify`` replaces the hardcoded
    upstream POST (`src/app.py:117-134`) with an injected callable."""

    def __init__(
        self,
        backend: LocalBackend,
        notify: Optional[Callable[[dict], None]] = None,
        status_delay: float = 0.0,
    ):
        self._backend = backend
        self._notify = notify
        self._status_delay = status_delay  # SLEEP_TIME analog (src/app.py:32)

    def schedule(self, body: dict) -> tuple[int, dict]:
        ok, reason = validate_schedule_request(body)
        if not ok:
            return 400, {"error": reason}
        job_id = self._backend.schedule(body)
        return 201, {"id": job_id, "location": f"/job/{job_id}"}

    def get(self, job_id: str) -> tuple[int, dict]:
        record = self._backend.get(job_id)
        if record is None:
            return 404, {"error": "job not found"}
        return 200, record.projection()

    def cancel(self, job_id: str) -> tuple[int, dict]:
        record = self._backend.get(job_id)
        if record is None:
            return 404, {"error": "job not found"}
        if not self._backend.cancel(job_id):
            return 409, {"error": "job not cancellable"}
        return 200, record.projection()

    def relay_status(self, job_id: str) -> tuple[int, dict]:
        """R38: acknowledge immediately, then re-describe after a delay and
        push the projection to the notify hook from a daemon thread
        (`src/app.py:137-152`)."""
        if self._backend.get(job_id) is None:
            return 404, {"error": "job not found"}

        def wait_and_send():
            import time as _t

            _t.sleep(self._status_delay)
            record = self._backend.get(job_id)
            if record is not None and self._notify is not None:
                self._notify(record.projection())

        threading.Thread(target=wait_and_send, daemon=True).start()
        return 204, {}
