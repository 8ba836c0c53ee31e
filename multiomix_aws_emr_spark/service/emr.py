"""EMR-on-EKS job backend: the reference's deployment story (R35-R37).

Re-founds `src/emr.py:17-102` — ``start_job_run`` / ``describe_job_run``
/ ``cancel_job_run`` against the ``emr-containers`` API — as a backend
class with the same ``schedule``/``get``/``cancel`` interface as
:class:`multiomix_aws_emr_spark.service.jobs.LocalBackend`, so
:class:`JobService` runs unchanged on either. The boto3 client is
INJECTED (any object with the three methods), which keeps the backend
fully testable without AWS and without a boto3 dependency; in
production, pass ``boto3.client("emr-containers")``.

Differences from the reference, deliberate:
- config comes in one mapping (virtual cluster id, execution role,
  release label, bucket, entrypoint) instead of 20 env vars (D9);
- API errors surface as a FAILED JobRecord with the error message in
  ``stateDetails`` rather than a logged ``None`` return
  (`src/emr.py:53-61` swallows them), so the D8 projection always has
  an answer for the control plane.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

from multiomix_aws_emr_spark.service.jobs import (
    JobRecord,
    marshal_entrypoint_args,
    spark_submit_params,
)

#: EMR job-run lifecycle states (describe_job_run ``state``), normalized
#: to the names the reference relays upstream.
_TERMINAL_STATES = {"COMPLETED", "FAILED", "CANCELLED"}


class EmrContainersBackend:
    """Job backend over an injected ``emr-containers``-shaped client.

    ``config`` keys (the operative subset of the reference's env vars):
    ``virtual_cluster_id``, ``execution_role``, ``release_label``,
    ``bucket``, ``entrypoint`` (script object name), optional
    ``spark_conf`` overrides for :func:`spark_submit_params`.
    """

    def __init__(self, client: Any, config: Mapping[str, str]):
        self._client = client
        self._cfg = dict(config)
        for key in ("virtual_cluster_id", "execution_role", "release_label",
                    "bucket", "entrypoint"):
            if key not in self._cfg:
                raise ValueError(f"missing EMR config key: {key}")
        self._records: dict[str, JobRecord] = {}

    # -- backend interface -------------------------------------------------

    def schedule(self, spec: Mapping[str, Any]) -> str:
        """``start_job_run`` with the reference's job-driver shape
        (`src/emr.py:32-52`): S3 entrypoint, marshalled entrypoint args,
        spark-submit conf string, S3 monitoring log URI."""
        bucket = self._cfg["bucket"]
        response = self._client.start_job_run(
            name=spec["name"],
            virtualClusterId=self._cfg["virtual_cluster_id"],
            executionRoleArn=self._cfg["execution_role"],
            releaseLabel=self._cfg["release_label"],
            jobDriver={
                "sparkSubmitJobDriver": {
                    "entryPoint": (
                        f"s3://{bucket}/scripts/{self._cfg['entrypoint']}"
                    ),
                    "entryPointArguments": marshal_entrypoint_args(
                        spec.get("entrypoint_arguments", [])
                    ),
                    "sparkSubmitParameters": spark_submit_params(
                        self._cfg.get("spark_conf")
                    ),
                }
            },
            configurationOverrides={
                "monitoringConfiguration": {
                    "s3MonitoringConfiguration": {
                        "logUri": f"s3://{bucket}/joblogs"
                    }
                }
            },
        )
        job_id = response["id"]
        self._records[job_id] = JobRecord(id=job_id, name=spec["name"])
        return job_id

    def get(self, job_id: str) -> Optional[JobRecord]:
        """``describe_job_run`` -> JobRecord (the D8 projection source).
        Unknown ids return None; API errors mark the record FAILED with
        details instead of hiding the job."""
        record = self._records.get(job_id)
        if record is None:
            return None
        try:
            response = self._client.describe_job_run(
                id=job_id, virtualClusterId=self._cfg["virtual_cluster_id"]
            )
        except Exception as exc:  # ValidationException etc. — boto3-shaped
            record.state = "FAILED"
            record.state_details = f"{type(exc).__name__}: {exc}"
            return record
        run = response.get("jobRun", response)
        record.state = run.get("state", record.state)
        record.state_details = run.get("stateDetails", "") or ""
        created = run.get("createdAt")
        if created is not None:
            record.created_at = str(created)
        finished = run.get("finishedAt")
        if finished is not None:
            record.finished_at = str(finished)
        elif record.state in _TERMINAL_STATES and record.finished_at is None:
            record.finished_at = record.created_at
        return record

    def cancel(self, job_id: str) -> bool:
        """``cancel_job_run``; False for unknown or already-terminal jobs
        (mirrors LocalBackend's contract so JobService's 409 logic
        holds)."""
        record = self.get(job_id)
        if record is None or record.state in _TERMINAL_STATES:
            return False
        try:
            self._client.cancel_job_run(
                id=job_id, virtualClusterId=self._cfg["virtual_cluster_id"]
            )
        except Exception:
            return False
        record.state = "CANCELLED"
        return True
