"""R28 process-isolated fitness + R35-R37 EMR-containers backend."""

import os

import numpy as np
import pytest

from multiomix_aws_emr_spark.fs.fitness import WORST_FITNESS
from multiomix_aws_emr_spark.fs.isolation import isolated
from multiomix_aws_emr_spark.service.emr import EmrContainersBackend
from multiomix_aws_emr_spark.service.jobs import JobService


def _fixture():
    rng = np.random.RandomState(0)
    n = 30
    x = rng.normal(size=(n, 3))
    time = 10 - 2 * x[:, 0] + rng.normal(0, 0.1, n)
    event = np.ones(n, dtype=bool)
    ids = np.array([f"S{i}" for i in range(n)])
    return x, time, event, ids


def test_isolated_passes_through_good_fitness():
    from multiomix_aws_emr_spark.fs.fitness import cv_linear_cox_fitness

    x, t, e, ids = _fixture()
    direct = cv_linear_cox_fitness(x, t, e, ids)
    via_process = isolated(cv_linear_cox_fitness)(x, t, e, ids)
    assert via_process == direct


def test_isolated_contains_hard_crash():
    """A fitness that kills its process (native-crash analog — the leak
    scenario of `scripts/main.py:200-226`) scores WORST_FITNESS instead
    of taking the worker down."""

    def crashing(x, t, e, ids):
        os._exit(13)

    x, t, e, ids = _fixture()
    assert isolated(crashing)(x, t, e, ids) == WORST_FITNESS


def test_isolated_contains_exception_and_hang():
    def raising(x, t, e, ids):
        raise MemoryError("leak")

    def hanging(x, t, e, ids):
        import time as _t

        _t.sleep(60)
        return 1.0

    x, t, e, ids = _fixture()
    assert isolated(raising)(x, t, e, ids) == WORST_FITNESS
    assert isolated(hanging, timeout=1.0)(x, t, e, ids) == WORST_FITNESS


def test_bbha_survives_flaky_isolated_fitness(spark):
    """End-to-end: a fitness that hard-crashes on subsets containing
    feature 0 still lets BBHA finish — crashed evaluations just lose."""
    import pandas as pd

    from multiomix_aws_emr_spark.fs.bbha import run_bbha
    from multiomix_aws_emr_spark.fs.fitness import cv_linear_cox_fitness

    def flaky(x, t, e, ids):
        if x.shape[1] % 2 == 1:  # crash on odd widths
            os._exit(1)
        return cv_linear_cox_fitness(x, t, e, ids)

    rng = np.random.RandomState(2)
    n_s, n_f = 20, 8
    x = pd.DataFrame(
        rng.normal(size=(n_s, n_f)),
        index=[f"S{i}" for i in range(n_s)],
        columns=[f"G{i}" for i in range(n_f)],
    )
    time = 10 + x["G0"].to_numpy()
    event = np.ones(n_s, dtype=bool)
    res = run_bbha(
        spark, x, time, event, n_stars=4, n_iterations=2, random_state=3,
        fitness_fn=isolated(flaky),
    )
    assert res.best_fitness >= WORST_FITNESS
    # 4 stars x 2 iterations + the R34 all-features baseline row
    assert len(res.history) == 9


# ---------------------------------------------------------------------------
# EMR backend (injected fake client)
# ---------------------------------------------------------------------------


class FakeEmrClient:
    """boto3 emr-containers shape: start/describe/cancel_job_run."""

    def __init__(self):
        self.runs = {}
        self.calls = []
        self._n = 0

    def start_job_run(self, **kwargs):
        self.calls.append(("start", kwargs))
        self._n += 1
        job_id = f"jr-{self._n:06d}"
        self.runs[job_id] = {
            "id": job_id,
            "state": "SUBMITTED",
            "createdAt": "2026-01-01T00:00:00Z",
            "stateDetails": "",
        }
        return {"id": job_id, "name": kwargs["name"],
                "virtualClusterId": kwargs["virtualClusterId"]}

    def describe_job_run(self, id, virtualClusterId):
        self.calls.append(("describe", id))
        return {"jobRun": dict(self.runs[id])}

    def cancel_job_run(self, id, virtualClusterId):
        self.calls.append(("cancel", id))
        self.runs[id]["state"] = "CANCELLED"
        return {"id": id, "virtualClusterId": virtualClusterId}


CFG = {
    "virtual_cluster_id": "vc-test",
    "execution_role": "arn:aws:iam::000000000000:role/test",
    "release_label": "emr-6.10.0-latest",
    "bucket": "test-bucket",
    "entrypoint": "main.py",
}


def _spec():
    return {
        "name": "exp-1",
        "algorithm": "BBHA",
        "entrypoint_arguments": [
            {"name": "app-name", "value": "exp-1"},
            {"name": "n-stars", "value": 8},
        ],
    }


def test_emr_backend_schedule_builds_reference_job_driver():
    client = FakeEmrClient()
    backend = EmrContainersBackend(client, CFG)
    job_id = backend.schedule(_spec())
    assert job_id == "jr-000001"
    _, kwargs = client.calls[0]
    driver = kwargs["jobDriver"]["sparkSubmitJobDriver"]
    assert driver["entryPoint"] == "s3://test-bucket/scripts/main.py"
    assert driver["entryPointArguments"][:2] == ["--app-name", "exp-1"]
    assert "--conf spark.sql.adaptive.enabled=true" in driver["sparkSubmitParameters"]
    mon = kwargs["configurationOverrides"]["monitoringConfiguration"]
    assert mon["s3MonitoringConfiguration"]["logUri"] == "s3://test-bucket/joblogs"


def test_emr_backend_lifecycle_through_job_service():
    """The same JobService used with LocalBackend runs on the EMR backend:
    schedule -> 201, describe -> D8 projection, cancel -> 200/409."""
    client = FakeEmrClient()
    service = JobService(EmrContainersBackend(client, CFG))

    code, body = service.schedule(_spec())
    assert code == 201
    job_id = body["id"]

    client.runs[job_id]["state"] = "RUNNING"
    code, proj = service.get(job_id)
    assert code == 200
    assert set(proj) == {"id", "createdAt", "finishedAt", "name", "state",
                         "stateDetails"}
    assert proj["state"] == "RUNNING"

    code, proj = service.cancel(job_id)
    assert code == 200 and proj["state"] == "CANCELLED"
    # terminal -> not cancellable again
    code, _ = service.cancel(job_id)
    assert code == 409
    # unknown id -> 404
    assert service.get("jr-zzz")[0] == 404


def test_emr_backend_validation_and_errors():
    with pytest.raises(ValueError, match="missing EMR config key"):
        EmrContainersBackend(FakeEmrClient(), {"bucket": "b"})

    class ExplodingClient(FakeEmrClient):
        def describe_job_run(self, id, virtualClusterId):
            raise RuntimeError("ValidationException: boom")

    backend = EmrContainersBackend(ExplodingClient(), CFG)
    job_id = backend.schedule(_spec())
    record = backend.get(job_id)
    assert record.state == "FAILED"
    assert "boom" in record.state_details
