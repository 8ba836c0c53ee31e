"""Stdlib-HTTP REST facade over :class:`JobService` — the reference's
Flask surface (`src/app.py`) with zero dependencies.

Routes (verb + path, same lifecycle as `src/app.py:37-152`):
- ``GET    /``          index/version banner (`src/app.py:37-40`) — the
  first thing an operator curls to confirm the service is up
- ``POST   /job``       schedule; 201 + Location header, 400 on invalid
- ``GET    /job/<id>``  status projection (D8); 404 unknown
- ``DELETE /job/<id>``  cancel; 200 / 404 / 409 (`src/app.py:95-105`)
- ``PATCH  /job/<id>``  async status relay; immediate 204
  (`src/app.py:137-152`)
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from multiomix_aws_emr_spark import __version__
from multiomix_aws_emr_spark.service.jobs import JobService

_JOB_PATH = re.compile(r"^/job/([A-Za-z0-9\-]+)$")


def _make_handler(service: JobService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, status: int, body: dict, location: str | None = None):
            payload = json.dumps(body).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            if location:
                self.send_header("Location", location)
            self.end_headers()
            if status != 204:
                self.wfile.write(payload)

        def _job_id(self) -> str | None:
            m = _JOB_PATH.match(self.path)
            return m.group(1) if m else None

        def do_POST(self):
            if self.path != "/job":
                return self._send(404, {"error": "not found"})
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                return self._send(400, {"error": "invalid JSON"})
            status, out = service.schedule(body)
            self._send(status, out, location=out.get("location"))

        def do_GET(self):
            if self.path == "/":
                # index/version banner (`src/app.py:37-40`); HTML there,
                # JSON here — every other route of this facade is JSON
                return self._send(
                    200,
                    {
                        "service": "multiomix-aws-emr-spark",
                        "version": __version__,
                    },
                )
            job_id = self._job_id()
            if job_id is None:
                return self._send(404, {"error": "not found"})
            status, out = service.get(job_id)
            self._send(status, out)

        def do_DELETE(self):
            job_id = self._job_id()
            if job_id is None:
                return self._send(404, {"error": "not found"})
            status, out = service.cancel(job_id)
            self._send(status, out)

        def do_PATCH(self):
            job_id = self._job_id()
            if job_id is None:
                return self._send(404, {"error": "not found"})
            status, out = service.relay_status(job_id)
            self._send(status, out)

        def log_message(self, *_args):  # keep test output quiet
            pass

    return Handler


class JobServer:
    """Threaded HTTP server wrapper; bind port 0 for an ephemeral port."""

    def __init__(self, service: JobService, host: str = "127.0.0.1", port: int = 0):
        self._httpd = ThreadingHTTPServer((host, port), _make_handler(service))
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def address(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "JobServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
