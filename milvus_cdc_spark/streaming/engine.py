"""Streaming engine: tail the changelog, apply each micro-batch exactly once.

The analogue of the reference's task runtime
(/root/reference/server/cdc_impl.go:504-597 ``startInternal`` building the
reader→writer graph, :796-877 the DML apply loop). A *task* here is one
Structured Streaming query:

    changelog dir --readStream--> foreachBatch(apply_batch) --> SnapshotTable

- **Checkpoint/resume**: the streaming checkpoint dir persists source
  offsets (reference: positions persisted per pack,
  server/cdc_impl.go:844-873); pause = stop the query, resume = start
  again with the same checkpoint. A batch replayed after a crash hits the
  epoch-idempotence gate in apply_batch and is skipped.
- **Pacing**: maxFilesPerTrigger bounds batch size (reference:
  readChanLen/backpressure, doc/cdc-usage.md:81-82).
- **Error pause**: a failing batch stops the query with the reason
  recorded (reference pause-on-error, server/cdc_impl.go:972-1003).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import SparkSession

from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.schemas import TRANSCRIPTS_BASE_COLUMNS
from milvus_cdc_spark.sources.changelog import read_changelog_stream


class CdcTask:
    """One replication task: changelog path → SnapshotTable.

    States mirror the reference task lifecycle Initial/Running/Paused
    (server/model/meta/task.go:29-42); state is derived from the live
    query handle + a small JSON status file next to the checkpoint.
    """

    def __init__(
        self,
        spark: SparkSession,
        changelog_path: str,
        table_root: str,
        checkpoint_dir: str,
        *,
        max_files_per_trigger: int | None = 4,
        salt_partitions: int | None = None,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.changelog_path = changelog_path
        self.table = SnapshotTable(table_root)
        if not self.table.exists():
            self.table.create(TRANSCRIPTS_BASE_COLUMNS, n_buckets=n_buckets)
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.salt_partitions = salt_partitions
        self.query = None
        self.last_error: str | None = None
        self._status_path = os.path.join(checkpoint_dir, "task_status.json")

    # -- lifecycle (reference C1-C4, server/cdc_api.go:26-36) -------------
    def start(self, available_now: bool = False):
        def _apply(batch_df, epoch_id: int):
            # Re-root the micro-batch onto the plain batch parquet reader:
            # the FileStreamSource's relation bypasses the vectorized-scan
            # fast path (measured 4-13x per-row CPU inflation on map
            # columns), while the file list IS the batch's exact,
            # checkpoint-replayable identity — so this is a pure physical
            # swap with identical contents and semantics.
            files = batch_df.inputFiles()
            if files:
                batch_df = self.spark.read.schema(batch_df.schema).parquet(*files)
            apply_batch(
                self.spark,
                self.table,
                batch_df,
                epoch_id,
                salt_partitions=self.salt_partitions,
            )

        stream = read_changelog_stream(
            self.spark, self.changelog_path, self.max_files_per_trigger
        )
        writer = (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(f"cdc:{os.path.basename(self.table.root)}")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="1 second")
        self.query = writer.start()
        self._write_status("Running")
        return self.query

    def pause(self):
        if self.query is not None:
            self.query.stop()
            self.query = None
        self._write_status("Paused")

    def resume(self, available_now: bool = False):
        return self.start(available_now=available_now)

    def wait_drained(self, timeout_sec: float = 600.0) -> bool:
        """Block until an availableNow run finishes; record errors."""
        assert self.query is not None
        try:
            ok = self.query.awaitTermination(timeout_sec)
            if ok:
                self._write_status("Stopped")
            return bool(ok)
        except Exception as e:  # error → pause with reason (reference C4)
            self.last_error = str(e)
            self._write_status("Paused", reason=self.last_error[:500])
            raise

    def drain_protected(
        self,
        protect: FailProtect | None = None,
        timeout_sec: float = 600.0,
    ) -> bool:
        """Drain with error-rate protection: restart after a transient
        failure (checkpoint + per-epoch idempotence make the replay safe),
        pause with reason once the failure rate trips ``protect``.

        Returns True when fully drained, False when tripped to Paused.
        """
        protect = protect or FailProtect()
        deadline = time.time() + timeout_sec
        while True:
            if self.query is None:
                self.start(available_now=True)
            try:
                ok = self.query.awaitTermination(max(0.1, deadline - time.time()))
                if ok:
                    self._write_status("Stopped")
                    return True
                self.pause()  # wall timeout — stop cleanly
                return False
            except Exception as e:
                self.query = None
                self.last_error = str(e)
                if protect.record_failure():
                    self._write_status(
                        "Paused",
                        reason="fail-protect tripped "
                        f"({protect.max_failures} failures in "
                        f"{protect.window_sec}s): {self.last_error[:400]}",
                    )
                    return False
                time.sleep(protect.backoff_sec)

    def status(self) -> dict[str, Any]:
        m = self.table.current()
        st = {"state": "Running" if self.query and self.query.isActive else "Stopped"}
        if os.path.exists(self._status_path):
            with open(self._status_path) as f:
                st.update(json.loads(f.read()))
            st["state"] = (
                "Running" if self.query and self.query.isActive else st.get("persisted_state", "Stopped")
            )
        st.update(
            {
                "snapshot_id": m.snapshot_id,
                "table_version": m.version,
                "epochs_committed": len(m.epochs),
                "summary": m.summary,
            }
        )
        return st

    def _write_status(self, state: str, reason: str | None = None):
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        with open(self._status_path, "w") as f:
            f.write(
                json.dumps(
                    {"persisted_state": state, "reason": reason, "ts": time.time()}
                )
            )


class FailProtect:
    """Error-rate protection: a task keeps retrying transient failures,
    but >= ``max_failures`` failures inside a sliding ``window_sec`` trip
    it to Paused — the reference's writer fail-protection
    (/root/reference/core/writer/fail_protect.go:28-99: per-window failure
    counter + trip)."""

    def __init__(
        self,
        max_failures: int = 3,
        window_sec: float = 60.0,
        backoff_sec: float = 0.5,
    ):
        self.max_failures = max_failures
        self.window_sec = window_sec
        self.backoff_sec = backoff_sec
        self.failure_ts: list[float] = []

    def record_failure(self, now: float | None = None) -> bool:
        """Record one failure; True = tripped (stop retrying)."""
        now = time.time() if now is None else now
        self.failure_ts.append(now)
        self.failure_ts = [t for t in self.failure_ts if now - t <= self.window_sec]
        return len(self.failure_ts) >= self.max_failures


class CollectionFilter:
    """The should-read predicate at engine level: wildcard-or-list minus
    excludes, the reference's task collection model (a task replicates N
    named collections or '*' minus an exclude list,
    /root/reference/server/cdc_impl.go:1195-1208).

    ``includes=None`` means wildcard '*'."""

    def __init__(
        self, includes: list[str] | None = None, excludes: list[str] | tuple = ()
    ):
        self.includes = list(includes) if includes is not None else None
        self.excludes = set(excludes)

    def should_read(self, name: str) -> bool:
        if name in self.excludes:
            return False
        return self.includes is None or name in self.includes

    def predicate(self):
        """Spark Column form — pushed into the micro-batch scan so
        excluded collections' events are pruned before any shuffle."""
        from pyspark.sql import functions as F

        pred = F.lit(True)
        if self.includes is not None:
            pred = (
                F.col("table_name").isin(*self.includes)
                if self.includes
                else F.lit(False)  # explicit empty subscription reads nothing
            )
        if self.excludes:
            pred = pred & ~F.col("table_name").isin(*sorted(self.excludes))
        return pred


class MultiCdcTask:
    """One replication task over a MULTIPLEXED changelog: N collections'
    events ride one ordered log (``table_name`` column); each micro-batch
    is split per collection and MERGEd into that collection's own
    SnapshotTable under ``tables_root/<name>``.

    The reference shape: a task owns several collection readers feeding
    shared channels (server/cdc_impl.go:1195-1208 collection discovery +
    should-read; core/reader/collection_reader.go). Exactly-once holds
    PER TABLE: each table's manifest has its own epoch gate, so a batch
    retried after a partial failure skips the tables that already
    committed and applies the rest.
    """

    def __init__(
        self,
        spark: SparkSession,
        changelog_path: str,
        tables_root: str,
        checkpoint_dir: str,
        *,
        collections: list[str] | None = None,
        excludes: list[str] | tuple = (),
        max_files_per_trigger: int | None = 4,
        salt_partitions: int | None = None,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.changelog_path = changelog_path
        self.tables_root = tables_root
        self.checkpoint_dir = checkpoint_dir
        self.filter = CollectionFilter(collections, excludes)
        self.max_files_per_trigger = max_files_per_trigger
        self.salt_partitions = salt_partitions
        self.n_buckets = n_buckets
        self.tables: dict[str, SnapshotTable] = {}
        self.query = None

    def table(self, name: str) -> SnapshotTable:
        """Idempotent create-on-first-event (reference skip-if-exists,
        core/writer/milvus_handler.go:119-125)."""
        t = self.tables.get(name)
        if t is None:
            t = SnapshotTable(os.path.join(self.tables_root, name))
            if not t.exists():
                t.create(TRANSCRIPTS_BASE_COLUMNS, n_buckets=self.n_buckets)
            self.tables[name] = t
        return t

    def start(self, available_now: bool = False):
        from pyspark.sql import functions as F

        def _apply(batch_df, epoch_id: int):
            files = batch_df.inputFiles()
            if files:  # same plain-reader re-root as CdcTask.start
                batch_df = self.spark.read.schema(batch_df.schema).parquet(*files)
            batch_df = batch_df.filter(self.filter.predicate())
            if self.filter.includes is not None:
                names = [n for n in self.filter.includes if self.filter.should_read(n)]
            else:  # wildcard: discover collections present in this batch
                names = [
                    r[0]
                    for r in batch_df.select("table_name").distinct().collect()
                    if self.filter.should_read(r[0])
                ]
            for name in sorted(names):
                apply_batch(
                    self.spark,
                    self.table(name),
                    batch_df.filter(F.col("table_name") == name).drop("table_name"),
                    epoch_id,
                    salt_partitions=self.salt_partitions,
                )

        stream = read_changelog_stream(
            self.spark,
            self.changelog_path,
            self.max_files_per_trigger,
            multi_table=True,
        )
        writer = (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(f"cdc-multi:{os.path.basename(self.tables_root)}")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="1 second")
        self.query = writer.start()
        return self.query

    def wait_drained(self, timeout_sec: float = 600.0) -> bool:
        assert self.query is not None
        return bool(self.query.awaitTermination(timeout_sec))


def run_until_drained(
    spark: SparkSession,
    changelog_path: str,
    table_root: str,
    checkpoint_dir: str,
    **kw,
) -> CdcTask:
    """Batch-drain mode: process everything currently in the log, then stop.

    availableNow still honors maxFilesPerTrigger, so the run is a sequence
    of bounded micro-batches with per-epoch commits — identical semantics
    to the continuous trigger, minus the idle polling.
    """
    task = CdcTask(spark, changelog_path, table_root, checkpoint_dir, **kw)
    task.start(available_now=True)
    task.wait_drained()
    return task
