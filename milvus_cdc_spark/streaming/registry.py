"""Cross-process task registry + pause signalling.

The reference keeps task metadata in etcd and serves eight HTTP verbs over
it (/root/reference/server/cdc_api.go:26-36, handlers
server/handle_map.go:35-133). Here the registry is a directory of JSON
task specs — the durable piece a CLI in ANOTHER process needs to
pause/resume/delete/list tasks it didn't start:

- ``<tasks_dir>/<name>.json``    task spec (log, table, checkpoint, conf)
- ``<checkpoint>/task_status.json``  persisted lifecycle state (written by
  the running task — see engine.CdcTask._write_status)
- ``<checkpoint>/PAUSE_REQUESTED``   pause signal: the process running the
  task polls for it at batch boundaries and stops gracefully; resume
  removes it and restarts from the streaming checkpoint.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

PAUSE_SENTINEL = "PAUSE_REQUESTED"


class TaskRegistry:
    def __init__(self, tasks_dir: str):
        self.tasks_dir = tasks_dir
        os.makedirs(tasks_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid task name: {name!r}")
        return os.path.join(self.tasks_dir, f"{name}.json")

    # -- CRUD (reference create/delete/get/list; validation analogue of
    # server/cdc_impl.go:186-362 — dup-collection checks, arg validation) -
    def create(self, name: str, spec: dict[str, Any]) -> dict[str, Any]:
        path = self._path(name)
        if os.path.exists(path):
            raise FileExistsError(f"task {name} already exists")
        for req in ("log", "table", "checkpoint"):
            if not spec.get(req):
                raise ValueError(f"task spec missing required field: {req}")
        # two tasks writing one table would break the single-writer commit
        # protocol; sharing a checkpoint corrupts both streams' offsets
        for other in self.list():
            for field in ("table", "checkpoint"):
                if os.path.normpath(other[field]) == os.path.normpath(spec[field]):
                    raise ValueError(
                        f"task {other['name']} already owns {field} {spec[field]}"
                    )
        spec = {**spec, "name": name, "created_ts": time.time()}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(spec, indent=1))
        os.replace(tmp, path)
        return spec

    def get(self, name: str) -> dict[str, Any]:
        with open(self._path(name)) as f:
            return json.loads(f.read())

    def delete(self, name: str, drop_checkpoint: bool = False) -> None:
        """Remove the task (signal pause first so a running process
        stops). The TABLE is kept — deleting a replication task must not
        destroy the replicated data (reference delete-task semantics)."""
        spec = self.get(name)
        self.request_pause(name)
        os.remove(self._path(name))
        if drop_checkpoint and spec.get("checkpoint"):
            import shutil

            shutil.rmtree(spec["checkpoint"], ignore_errors=True)

    def list(self) -> list[dict[str, Any]]:
        out = []
        for fn in sorted(os.listdir(self.tasks_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.tasks_dir, fn)) as f:
                    spec = json.loads(f.read())
                spec["status"] = self.status(spec)
                out.append(spec)
        return out

    # -- lifecycle signals (reference pause/resume) ----------------------
    def _sentinel(self, spec_or_name) -> str:
        spec = (
            spec_or_name
            if isinstance(spec_or_name, dict)
            else self.get(spec_or_name)
        )
        return os.path.join(spec["checkpoint"], PAUSE_SENTINEL)

    def request_pause(self, name: str) -> None:
        spec = self.get(name) if isinstance(name, str) else name
        os.makedirs(spec["checkpoint"], exist_ok=True)
        with open(self._sentinel(spec), "w") as f:
            f.write(str(time.time()))

    def clear_pause(self, name: str) -> None:
        try:
            os.remove(self._sentinel(name))
        except FileNotFoundError:
            pass

    def pause_requested(self, spec_or_name) -> bool:
        return os.path.exists(self._sentinel(spec_or_name))

    def position(self, spec_or_name) -> dict[str, Any]:
        """Source-offset → sink-snapshot position report (the reference's
        ``getPosition`` verb, server/cdc_api.go:26-36: task positions =
        consumed MQ offsets per channel). No Spark session: reads the
        streaming checkpoint's commit/offset log, the table manifest, and
        the per-partition lineage parquet directly."""
        spec = (
            spec_or_name
            if isinstance(spec_or_name, dict)
            else self.get(spec_or_name)
        )
        out: dict[str, Any] = {"name": spec.get("name")}
        commits_dir = os.path.join(spec["checkpoint"], "commits")
        batches = (
            [int(f) for f in os.listdir(commits_dir) if f.isdigit()]
            if os.path.isdir(commits_dir)
            else []
        )
        if batches:
            last = max(batches)
            out["last_committed_batch"] = last
            # offsets/<batch>: line 1 = version, line 2 = batch metadata,
            # line 3+ = one offset JSON per source
            off_path = os.path.join(spec["checkpoint"], "offsets", str(last))
            if os.path.exists(off_path):
                lines = open(off_path).read().strip().splitlines()
                try:
                    out["source_offsets"] = [json.loads(ln) for ln in lines[2:]]
                except json.JSONDecodeError:
                    out["source_offsets"] = lines[2:]
        cur = os.path.join(spec["table"], "meta", "CURRENT")
        if os.path.exists(cur):
            with open(cur) as f:
                v = int(f.read().strip())
            with open(os.path.join(spec["table"], "meta", f"v{v}.json")) as f:
                m = json.loads(f.read())
            out["table"] = {
                "version": v,
                "snapshot_id": m["snapshot_id"],
                "epochs_committed": len(m["epochs"]),
                "last_epoch": m.get("summary", {}).get("last_epoch"),
            }
            lin_dir = os.path.join(spec["table"], "lineage")
            if os.path.isdir(lin_dir):
                import pyarrow.dataset as ds

                t = ds.dataset(lin_dir, format="parquet").to_table(
                    columns=["part", "end_lsn"]
                )
                ends: dict[int, int] = {}
                for part, end in zip(
                    t.column("part").to_pylist(), t.column("end_lsn").to_pylist()
                ):
                    if end is not None and (part not in ends or end > ends[part]):
                        ends[part] = end
                out["applied_end_lsn_per_part"] = {
                    str(k): v for k, v in sorted(ends.items())
                }
        return out

    def status(self, spec: dict[str, Any]) -> dict[str, Any]:
        st: dict[str, Any] = {"state": "Initial"}
        status_path = os.path.join(spec["checkpoint"], "task_status.json")
        if os.path.exists(status_path):
            with open(status_path) as f:
                persisted = json.loads(f.read())
            st["state"] = persisted.get("persisted_state", "Initial")
            if persisted.get("reason"):
                st["reason"] = persisted["reason"]
        if self.pause_requested(spec):
            st["pause_requested"] = True
        return st
