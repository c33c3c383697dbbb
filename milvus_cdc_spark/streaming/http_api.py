"""HTTP task-management facade over the registry.

1:1 parity with the reference's server surface: one POST endpoint whose
JSON body carries ``request_type`` + ``request_data``, dispatched to the
task verbs (/root/reference/server/server.go:54-66 single ``/cdc``
handler, :116-120 request_type dispatch; verb set
server/cdc_api.go:26-36: Create/Delete/Pause/Resume/Get/GetPosition/
List/Maintenance). Everything maps onto the existing file-backed
``TaskRegistry`` — the HTTP layer adds no state of its own, so a CLI, a
second operator's curl, and a scheduler all see the same tasks.

Spark-free by design: the verbs served here are exactly the registry's
Spark-free surface (create/delete/pause-signal/resume-signal/get/list/
position, plus the vacuum maintenance verb, which reads manifests and
deletes files). Verbs that need a SparkSession (drain/compact/convert)
belong to the worker process running the task — the reference splits the
same way (the HTTP server manages task metadata; replication work runs
in the task goroutines).

    python -m milvus_cdc_spark.streaming.cli serve \
        --tasks-dir /mnt/lake/tasks --port 8444

    curl -X POST localhost:8444/cdc -d '{
        "request_type": "list"}'
    curl -X POST localhost:8444/cdc -d '{
        "request_type": "pause", "request_data": {"task_name": "t1"}}'

Responses: ``{"code": 200, "data": ...}`` on success, ``{"code": 4xx/5xx,
"message": ...}`` on failure (the reference's handleError JSON shape).
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from milvus_cdc_spark.streaming.registry import TaskRegistry


class _Api:
    """request_type → handler over one TaskRegistry."""

    def __init__(self, tasks_dir: str):
        self.registry = TaskRegistry(tasks_dir)

    # each handler: request_data dict → JSON-able response data
    def create(self, d: dict[str, Any]):
        name = d.pop("task_name", None) or d.pop("name", None)
        if not name:
            raise ValueError("create needs request_data.task_name")
        return self.registry.create(name, d)

    def delete(self, d: dict[str, Any]):
        self.registry.delete(
            self._name(d), drop_checkpoint=bool(d.get("drop_checkpoint"))
        )
        return {"deleted": True}

    def pause(self, d: dict[str, Any]):
        # sets the cross-process pause sentinel; the process running the
        # drain stops at its next batch boundary (engine.drain_protected
        # polls it) — the reference's pause is likewise a state flip
        self.registry.request_pause(self._name(d))
        return {"pause_requested": True}

    def resume(self, d: dict[str, Any]):
        self.registry.clear_pause(self._name(d))
        return {"resume_requested": True}

    def get(self, d: dict[str, Any]):
        spec = self.registry.get(self._name(d))
        return {"spec": spec, "status": self.registry.status(spec)}

    def get_position(self, d: dict[str, Any]):
        return self.registry.position(self._name(d))

    def list(self, d: dict[str, Any]):
        return {
            "tasks": [
                {"spec": s, "status": self.registry.status(s)}
                for s in self.registry.list()
            ]
        }

    def maintenance(self, d: dict[str, Any]):
        """Spark-free maintenance only: vacuum. compact/convert/rebucket
        run Spark jobs and belong to a worker (CLI verbs)."""
        from milvus_cdc_spark.plans.manifest import SnapshotTable

        if d.get("op", "vacuum") != "vacuum":
            raise ValueError(
                "HTTP maintenance supports op='vacuum' only; run "
                "compact/convert/rebucket through the CLI (they need a "
                "SparkSession)"
            )
        spec = self.registry.get(self._name(d))
        roots = []
        if spec.get("table"):
            roots.append(spec["table"])
        elif spec.get("tables_root"):
            from milvus_cdc_spark.streaming.registry import _walk_tables

            roots.extend(r for _n, r in _walk_tables(spec["tables_root"]))
        out = {}
        for r in roots:
            out[r] = SnapshotTable(r).vacuum(
                keep_versions=int(d.get("keep_versions", 2)),
                min_age_sec=float(d.get("min_age_sec", 3600.0)),
            )
        return out

    @staticmethod
    def _name(d: dict[str, Any]) -> str:
        name = d.get("task_name") or d.get("name")
        if not name:
            raise ValueError("request_data.task_name is required")
        return name


#: the reference's exact verb set (server/cdc_api.go:26-36) — an explicit
#: allowlist so request_type can never resolve a non-verb attribute
_VERBS = frozenset(
    {"create", "delete", "pause", "resume", "get", "get_position",
     "list", "maintenance"}
)


def _make_handler(api: _Api):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: status rides the response
            pass

        def _reply(self, code: int, body: dict[str, Any]):
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            if self.path.rstrip("/") not in ("", "/cdc"):
                return self._reply(
                    404, {"code": 404, "message": f"no route {self.path}"}
                )
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                rtype = req.get("request_type")
                handler = (
                    getattr(api, rtype, None) if rtype in _VERBS else None
                )
                if handler is None:
                    return self._reply(
                        400,
                        {
                            "code": 400,
                            "message": "invalid 'request_type' param, can "
                            "be set create/delete/pause/resume/get/"
                            f"get_position/list/maintenance (got {rtype!r})",
                        },
                    )
                data = handler(dict(req.get("request_data") or {}))
                return self._reply(200, {"code": 200, "data": data})
            except (ValueError, FileNotFoundError, FileExistsError) as e:
                return self._reply(400, {"code": 400, "message": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                return self._reply(500, {"code": 500, "message": repr(e)})

        def do_GET(self):
            # reference only supports POST (server.go:65-66); a GET is a
            # usability nicety for /health only
            if self.path.rstrip("/") == "/health":
                return self._reply(200, {"code": 200, "data": "ok"})
            return self._reply(
                405, {"code": 405, "message": "only support the POST method"}
            )

    return Handler


def serve(
    tasks_dir: str, host: str = "127.0.0.1", port: int = 8444
) -> ThreadingHTTPServer:
    """Build (not start) the server; caller runs ``serve_forever()`` or
    drives it from a thread (tests). Port 0 picks an ephemeral port."""
    return ThreadingHTTPServer((host, port), _make_handler(_Api(tasks_dir)))


def main(argv: list[str] | None = None) -> int:  # pragma: no cover - loop
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tasks-dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8444)
    a = p.parse_args(argv)
    srv = serve(a.tasks_dir, a.host, a.port)
    print(f"cdc http api on {srv.server_address} (tasks: {a.tasks_dir})")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
