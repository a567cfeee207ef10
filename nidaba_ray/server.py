"""Minimal job-submission / status HTTP API — the nidaba REST analog
(SURVEY.md §3.2: nidaba exposes batch creation + status over HTTP).
stdlib ``http.server`` only (sandbox pins: no web frameworks; binds
localhost). The real contract is the JSON shapes and the job
lifecycle, not the HTTP plumbing — a production build would mount the
same registry behind any ASGI server.

Endpoints:
    GET  /health        → {"status": "ok"}
    POST /jobs          → {"job_id": ...}; body JSON (optional
    "pipeline": an ordered registry stage list runs instead of the
    flagship, same resume contract as `runner.run_job(spec=…)`):
                          {"input": path, "out_dir": path,
                           "n_buckets": int (optional)}
    GET  /jobs          → {"jobs": [record, ...]}
    GET  /jobs/<id>     → record + live manifest rollup (job_status)

Jobs execute on a single background worker thread (one at a time —
each run_job drives the whole Ray cluster; queueing is the correct
multi-tenancy story on a fixed-size cluster). The embedding process
owns the Ray session; this module never calls ``ray.init`` (driver
contract) except in the guarded CLI ``main``.
"""

from __future__ import annotations

import json
import queue
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from nidaba_ray.pipelines import runner

__all__ = ["JobRegistry", "make_server", "main"]


class JobRegistry:
    """In-process job table + single worker thread."""

    def __init__(self) -> None:
        self._jobs: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._queue: queue.Queue[str] = queue.Queue()
        self._worker = threading.Thread(target=self._run_loop, daemon=True)
        self._worker.start()

    def submit(self, spec: dict) -> str:
        if not isinstance(spec, dict):
            raise ValueError("body must be a JSON object")
        if "input" not in spec or "out_dir" not in spec:
            raise ValueError("spec needs 'input' and 'out_dir'")
        pipeline = spec.get("pipeline")
        if pipeline is not None and (
            not isinstance(pipeline, list)
            or not all(isinstance(st, dict) and "stage" in st
                       for st in pipeline)
        ):
            raise ValueError("'pipeline' must be a list of {stage: ...} steps")
        job_id = uuid.uuid4().hex[:12]
        with self._lock:
            self._jobs[job_id] = {
                "job_id": job_id,
                "state": "queued",
                "spec": {"input": spec["input"], "out_dir": spec["out_dir"],
                         "n_buckets": int(spec.get("n_buckets",
                                                   runner.DEFAULT_BUCKETS)),
                         "pipeline": pipeline},
                "summary": None,
                "error": None,
            }
        self._queue.put(job_id)
        return job_id

    def get(self, job_id: str) -> dict | None:
        with self._lock:
            rec = self._jobs.get(job_id)
            rec = dict(rec) if rec else None
        if rec is not None:
            # live progress straight from the manifests (crash-safe
            # source of truth — same rollup the CLI `status` uses)
            try:
                rec["progress"] = runner.job_status(
                    rec["spec"]["out_dir"], rec["spec"]["n_buckets"]
                )
            except OSError:
                rec["progress"] = None
        return rec

    def list(self) -> list[dict]:
        with self._lock:
            return [dict(r) for r in self._jobs.values()]

    def _run_loop(self) -> None:
        while True:
            job_id = self._queue.get()
            with self._lock:
                rec = self._jobs[job_id]
                rec["state"] = "running"
                spec = rec["spec"]
            try:
                summary = runner.run_job(
                    spec["input"], spec["out_dir"], spec["n_buckets"],
                    spec=spec.get("pipeline"),
                )
                with self._lock:
                    self._jobs[job_id]["summary"] = summary
                    self._jobs[job_id]["state"] = "done"
            except Exception as e:  # job isolation: server survives
                with self._lock:
                    self._jobs[job_id]["error"] = f"{type(e).__name__}: {e}"
                    self._jobs[job_id]["state"] = "error"


def make_server(host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``port=0`` binds an
    ephemeral port (``server.server_address[1]`` has the real one)."""
    registry = JobRegistry()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (stdlib API)
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            elif self.path == "/jobs":
                self._send(200, {"jobs": registry.list()})
            elif self.path.startswith("/jobs/"):
                rec = registry.get(self.path[len("/jobs/"):])
                if rec is None:
                    self._send(404, {"error": "no such job"})
                else:
                    self._send(200, rec)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self) -> None:  # noqa: N802
            if self.path != "/jobs":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                spec = json.loads(self.rfile.read(n) or b"{}")
                job_id = registry.submit(spec)
            except (ValueError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
                return
            self._send(201, {"job_id": job_id})

        def log_message(self, *args) -> None:  # quiet test output
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.registry = registry  # type: ignore[attr-defined] — test access
    return srv


def main(argv: list[str]) -> None:
    """``python -m nidaba_ray.server [port]`` — owns a Ray session."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    port = int(argv[0]) if argv else 8265
    srv = make_server(port=port)
    print(f"nidaba_ray job server on http://127.0.0.1:{srv.server_address[1]}",
          flush=True)
    try:
        srv.serve_forever()
    finally:
        ray.shutdown()


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
