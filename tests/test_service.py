"""Control-plane tests: validation, marshalling, conf builder, job
lifecycle, and the stdlib REST facade driven over a real socket."""

import json
import random
import threading
import time
import urllib.request

import pytest

from multiomix_aws_emr_spark.service.jobs import (
    JobService,
    LocalBackend,
    marshal_entrypoint_args,
    random_job_name,
    spark_submit_params,
    validate_schedule_request,
)
from multiomix_aws_emr_spark.service.rest import JobServer


def _valid_body(**over):
    body = {
        "name": "exp-1",
        "algorithm": "BBHA",
        "entrypoint_arguments": [
            {"name": "app-name", "value": "exp-1"},
            {"name": "n-stars", "value": 6},
        ],
    }
    body.update(over)
    return body


def test_validation():
    assert validate_schedule_request(_valid_body()) == (True, "")
    ok, why = validate_schedule_request({})
    assert not ok and "name" in why
    ok, why = validate_schedule_request(_valid_body(entrypoint_arguments=[]))
    assert not ok and "app-name" in why


def test_marshalling():
    # emr.py:156-164 semantics: {name,value} pairs -> ["--name", "value"]
    args = marshal_entrypoint_args(
        [{"name": "app-name", "value": "x"}, {"name": "n-stars", "value": 6}]
    )
    assert args == ["--app-name", "x", "--n-stars", "6"]


def test_spark_submit_params():
    s = spark_submit_params({"spark.executor.instances": 7})
    assert "--conf spark.executor.instances=7" in s
    assert "--conf spark.executor.heartbeatInterval=600s" in s  # Dockerfile:15
    assert "--conf spark.network.timeout=2400s" in s  # Dockerfile:16


def test_random_job_name_seeded():
    n1 = random_job_name("BBHA", rng=random.Random(1))
    n2 = random_job_name("BBHA", rng=random.Random(1))
    assert n1 == n2
    assert n1.startswith("engine-bbha-")


def test_local_job_lifecycle():
    done = threading.Event()

    def runner(spec):
        done.wait(5)

    backend = LocalBackend(runner)
    service = JobService(backend)
    status, out = service.schedule(_valid_body())
    assert status == 201
    jid = out["id"]
    time.sleep(0.1)
    assert service.get(jid)[1]["state"] == "RUNNING"
    done.set()
    backend.wait(jid)
    proj = service.get(jid)[1]
    assert proj["state"] == "COMPLETED" and proj["finishedAt"]
    # completed jobs are not cancellable -> 409 (src/app.py:95-105)
    assert service.cancel(jid)[0] == 409


def test_local_job_failure_projection():
    backend = LocalBackend(lambda spec: (_ for _ in ()).throw(ValueError("boom")))
    service = JobService(backend)
    _, out = service.schedule(_valid_body())
    backend.wait(out["id"])
    proj = service.get(out["id"])[1]
    assert proj["state"] == "FAILED"
    assert "boom" in proj["stateDetails"]


@pytest.fixture()
def server():
    notifications = []
    backend = LocalBackend(lambda spec: time.sleep(0.05))
    service = JobService(backend, notify=notifications.append, status_delay=0.1)
    srv = JobServer(service).start()
    yield srv, backend, notifications
    srv.stop()


def _req(method, url, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else {}, dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}"), dict(e.headers)


def test_rest_index_version_banner(server):
    """GET / answers with the service/version banner (`src/app.py:37-40`)
    — the liveness probe an operator curls first; JSON here where the
    reference renders HTML, same lifecycle."""
    from multiomix_aws_emr_spark import __version__

    srv, _, _ = server
    status, body, _ = _req("GET", f"{srv.address}/")
    assert status == 200
    assert body == {
        "service": "multiomix-aws-emr-spark",
        "version": __version__,
    }
    # any other non-/job GET path still 404s
    assert _req("GET", f"{srv.address}/nope")[0] == 404


def test_rest_roundtrip(server):
    srv, backend, notifications = server
    # schedule -> 201 + Location (src/app.py:59-63)
    status, out, headers = _req("POST", f"{srv.address}/job", _valid_body())
    assert status == 201
    jid = out["id"]
    assert headers["Location"] == f"/job/{jid}"
    # invalid -> 400
    assert _req("POST", f"{srv.address}/job", {"nope": 1})[0] == 400
    # status projection (D8)
    backend.wait(jid)
    status, proj, _ = _req("GET", f"{srv.address}/job/{jid}")
    assert status == 200
    assert set(proj) == {"id", "createdAt", "finishedAt", "name", "state", "stateDetails"}
    assert proj["state"] == "COMPLETED"
    # async relay: immediate 204, notification arrives later (src/app.py:137-152)
    status, _, _ = _req("PATCH", f"{srv.address}/job/{jid}")
    assert status == 204
    deadline = time.time() + 3
    while not notifications and time.time() < deadline:
        time.sleep(0.02)
    assert notifications and notifications[0]["id"] == jid
    # unknown job -> 404
    assert _req("GET", f"{srv.address}/job/zzz")[0] == 404
