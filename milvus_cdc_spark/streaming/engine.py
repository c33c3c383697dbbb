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
- **Multi-collection tasks** (``MultiCdcTask``) drain a MULTIPLEXED log:
  per-collection slices are MERGEd CONCURRENTLY (reference: one goroutine
  per channel stream, core/reader/replicate_channel_manager.go:809-825),
  and namespace (database) DDL — CREATE_NAMESPACE/DROP_NAMESPACE, the
  CreateDatabase/DropDatabase analogue (core/writer/channel_writer.go:
  102-114) — routes ``<ns>.<table>`` names into per-namespace directories.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Callable

from pyspark.sql import SparkSession

from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.schemas import TRANSCRIPTS_BASE_COLUMNS
from milvus_cdc_spark.sources.changelog import read_changelog_stream


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


def _union_history(
    spark, batch_df, history_path: str | None, multi_table: bool = False
):
    """Union the decoded Debezium schema-history stream into a micro-
    batch. The history dir is re-decoded IN FULL each trigger: decoding
    needs every table's previous column state (consecutive-state diff),
    the topic is DDL-scale by nature, and re-applied ADD/WIDEN events
    are idempotent at the manifest (skip-if-exists / lattice-max) — so
    live DDL costs one tiny text scan per trigger and no extra state."""
    if not history_path:
        return batch_df
    if not os.path.isdir(history_path) or not any(
        not f.startswith(("_", ".")) for f in os.listdir(history_path)
    ):
        return batch_df  # topic not created yet / empty
    from milvus_cdc_spark.sources.debezium import read_debezium_history

    return batch_df.unionByName(
        read_debezium_history(spark, history_path, multi_table=multi_table)
    )


def _kafka_stream(
    spark, changelog_path: str, kafka_options: dict, multi_table: bool
):
    """Build the decoded Kafka changelog stream from a task's options.
    The topic defaults to ``changelog_path`` so registry specs keep one
    'log' field across all sources."""
    from milvus_cdc_spark.sources.kafka import read_kafka_stream

    ko = dict(kafka_options)
    return read_kafka_stream(
        spark,
        ko.pop("bootstrap_servers"),
        ko.pop("topic", None) or changelog_path,
        value_format=ko.pop("value_format", "native"),
        multi_table=multi_table,
        starting_offsets=ko.pop("starting_offsets", "earliest"),
        max_offsets_per_trigger=ko.pop("max_offsets_per_trigger", None),
        options=ko,
    )


class _TaskLifecycle:
    """Shared task lifecycle: start/pause/resume/drain + persisted status.

    States mirror the reference task lifecycle Initial/Running/Paused
    (server/model/meta/task.go:29-42); state is derived from the live
    query handle + a small JSON status file next to the checkpoint, which
    is what lets a CLI in ANOTHER process see/manage the task
    (streaming/registry.py)."""

    query = None
    last_error: str | None = None
    auto_compact_files: int | None = None

    def _init_lifecycle(self, checkpoint_dir: str) -> None:
        self.checkpoint_dir = checkpoint_dir
        self._status_path = os.path.join(checkpoint_dir, "task_status.json")
        self._fold_pool = None
        # MultiCdcTask calls _maybe_compact concurrently from per-table
        # worker threads; the lazy pool init must not race (two pools,
        # one leaked with a live non-daemon worker)
        self._fold_pool_lock = threading.Lock()
        self._fold_futures: dict[str, Any] = {}
        self._fold_errors: dict[str, str] = {}

    def _maybe_compact(self, table) -> None:
        """Merge-on-read housekeeping at an epoch boundary, NON-BLOCKING
        and PER-BUCKET: once a bucket's delta chain exceeds
        ``auto_compact_files`` files, fold the over-threshold buckets ONLY
        (SnapshotTable.compact_buckets — cost ∝ the offending chains, not
        table size: one hot bucket no longer imposes an O(table) rewrite
        at the epoch boundary) on a background worker, so the epoch loop
        never stalls behind the rewrite (Iceberg rewrite_data_files on a
        file-count trigger; the reference leans on Milvus target-side
        auto-compaction). Concurrency safety is owned by the storage
        layer: the fold commits by BUCKET-LEVEL CAS — buckets that gained
        a delta mid-fold are skipped and re-folded next trigger — and the
        epoch commit REBASES its delta append over a fold commit
        (manifest.commit's maintenance rebase), so neither side ever
        fails the other. One fold in flight per table; a failed fold is
        recorded (status ``fold_errors``) and retried at the next
        boundary — reads stay correct either way, just costlier until
        folded (test_mor.py pins overlap + final-state equality)."""
        if not self.auto_compact_files:
            return
        fut = self._fold_futures.get(table.root)
        if fut is not None:
            if not fut.done():
                return
            exc = fut.exception()
            self._fold_futures.pop(table.root, None)
            if exc is not None:
                self._fold_errors[table.root] = repr(exc)
        m = table.current()
        hot = [
            int(b)
            for b, v in m.files.items()
            if len(v) > self.auto_compact_files
        ]
        if not hot:
            return
        with self._fold_pool_lock:
            if self._fold_pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._fold_pool = ThreadPoolExecutor(
                    max_workers=2, thread_name_prefix="bucket-fold"
                )
        self._fold_futures[table.root] = self._fold_pool.submit(
            table.compact_buckets, self.spark, hot
        )

    def _join_folds(self) -> None:
        """Wait out in-flight background folds at a clean stop (drain
        completion / pause): the fold tolerates concurrent writers, but
        stopping shouldn't leave an orphan thread running Spark jobs."""
        for root, fut in list(self._fold_futures.items()):
            try:
                fut.result()
            except Exception as e:  # recorded, retried next start
                self._fold_errors[root] = repr(e)
            self._fold_futures.pop(root, None)

    def start(self, available_now: bool = False):  # pragma: no cover - abstract
        raise NotImplementedError

    def pause(self, reason: str | None = None):
        if self.query is not None:
            self.query.stop()
            self.query = None
        self._join_folds()
        self._write_status("Paused", reason=reason)

    def resume(self, available_now: bool = False):
        return self.start(available_now=available_now)

    def wait_drained(self, timeout_sec: float = 600.0) -> bool:
        """Block until an availableNow run finishes; record errors."""
        assert self.query is not None
        try:
            ok = self.query.awaitTermination(timeout_sec)
            if ok:
                self._join_folds()
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
        pause_check: Callable[[], bool] | None = None,
        poll_sec: float = 0.3,
    ) -> bool:
        """Drain with error-rate protection: restart after a transient
        failure (checkpoint + per-epoch idempotence make the replay safe),
        pause with reason once the failure rate trips ``protect``.

        ``pause_check`` is polled between ``poll_sec`` await slices so a
        CROSS-PROCESS pause request (registry sentinel) stops a long drain
        at the next batch boundary instead of being ignored until the
        drain completes.

        Returns True when fully drained, False when paused or tripped.
        """
        protect = protect or FailProtect()
        deadline = time.time() + timeout_sec
        while True:
            try:
                if self.query is None or not self.query.isActive:
                    # a query left over from a PREVIOUS completed drain is
                    # terminated — holding onto it would make an in-process
                    # re-drain return instantly without reading anything
                    # new; restarting is free when there is nothing to do
                    # (the availableNow run sees no new input and stops).
                    # Inside the try: start() itself can now fail — the
                    # WAL gate replays a crash-parked intent there, and a
                    # poison group must route into fail-protect like any
                    # other batch failure.
                    self.start(available_now=True)
                while True:
                    remaining = deadline - time.time()
                    if remaining <= 0:
                        self.pause(reason="drain wall timeout")
                        return False
                    if pause_check is not None and pause_check():
                        self.pause(reason="pause requested")
                        return False
                    slice_sec = (
                        remaining if pause_check is None
                        else min(poll_sec, max(0.05, remaining))
                    )
                    if self.query.awaitTermination(slice_sec):
                        self._join_folds()
                        self._write_status("Stopped")
                        return True
                    if pause_check is None:
                        self.pause(reason="drain wall timeout")
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
        st = {"state": "Running" if self.query and self.query.isActive else "Stopped"}
        if os.path.exists(self._status_path):
            with open(self._status_path) as f:
                st.update(json.loads(f.read()))
            st["state"] = (
                "Running"
                if self.query and self.query.isActive
                else st.get("persisted_state", "Stopped")
            )
        if self._fold_errors:
            st["fold_errors"] = dict(self._fold_errors)
        st.update(self._status_extra())
        return st

    def _status_extra(self) -> dict[str, Any]:
        return {}

    def _write_status(self, state: str, reason: str | None = None):
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        with open(self._status_path, "w") as f:
            f.write(
                json.dumps(
                    {"persisted_state": state, "reason": reason, "ts": time.time()}
                )
            )


class CdcTask(_TaskLifecycle):
    """One replication task: changelog path → SnapshotTable."""

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
        write_mode: str = "cow",
        auto_compact_files: int | None = None,
        on_malformed: str = "fail",
        constraints: list[str] | None = None,
        on_violation: str = "fail",
        source: str = "parquet",
        history_path: str | None = None,
        wal_order: bool = True,
        kafka_options: dict | None = None,
    ):
        if source not in ("parquet", "debezium", "kafka"):
            raise ValueError(
                "source must be 'parquet', 'debezium', or 'kafka', got "
                f"{source!r}"
            )
        if history_path and source != "debezium":
            raise ValueError(
                "history_path only applies to source='debezium' (the "
                "native parquet/kafka changelogs carry DDL inline)"
            )
        if source == "kafka":
            if not (kafka_options or {}).get("bootstrap_servers"):
                raise ValueError(
                    "source='kafka' requires kafka_options="
                    "{'bootstrap_servers': ..., [topic/value_format/"
                    "starting_offsets/max_offsets_per_trigger/...]}; the "
                    "topic defaults to changelog_path"
                )
        elif kafka_options:
            raise ValueError("kafka_options only applies to source='kafka'")
        self.spark = spark
        self.changelog_path = changelog_path
        self.on_malformed = on_malformed
        self.constraints = list(constraints or [])
        self.on_violation = on_violation
        # 'parquet' = native changelog files; 'debezium' = JSON-lines
        # Debezium envelopes, normalized to the same schema at the scan
        # (sources/debezium.py); 'kafka' = an MQ topic decoded at the
        # value column (sources/kafka.py — the reference's own source
        # shape, core/reader/stream_creator.go:39-159) — everything
        # downstream is identical
        self.source = source
        self.kafka_options = dict(kafka_options or {})
        # WAL-regime batch formation (streaming/wal.py): files apply in
        # lsn order regardless of the file-stream source's mtime-ordered
        # delivery — REQUIRED for OP_PATCH correctness (a patch must not
        # commit before its anchor's epoch, schemas.OP_PATCH). Default on;
        # wal_order=False restores raw stream batching for logs known to
        # be order-insensitive (no patches) with non-WAL producers. Not
        # applicable to Kafka: the broker already delivers each partition
        # in order (the reference's per-channel contract) and there are no
        # files to re-form — run patch-carrying topics single-partition or
        # conv_id-keyed (sources/kafka.py ordering contract).
        self.wal_order = wal_order and source != "kafka"
        # Debezium schema-change topic directory: re-decoded IN FULL each
        # trigger (history topics are DDL-scale; decoding needs every
        # table's previous column state) and unioned into the batch —
        # re-applied ADD/WIDEN events are idempotent at the manifest
        # (skip-if-exists / lattice-max), so live DDL needs no extra
        # bookkeeping. See sources/debezium.py::read_debezium_history.
        self.history_path = history_path
        self.table = SnapshotTable(table_root)
        if not self.table.exists():
            self.table.create(
                TRANSCRIPTS_BASE_COLUMNS, n_buckets=n_buckets,
                write_mode=write_mode,
            )
        self.max_files_per_trigger = max_files_per_trigger
        self.salt_partitions = salt_partitions
        # merge-on-read housekeeping: compact at the NEXT epoch boundary
        # once any bucket's delta chain exceeds this many files, bounding
        # read-side resolution cost without blocking the hot path mid-epoch
        # (the reference relies on Milvus auto-compaction target-side; in
        # Iceberg terms this is rewrite_data_files on a file-count trigger)
        self.auto_compact_files = auto_compact_files
        self._init_lifecycle(checkpoint_dir)
        self._gate = None
        if self.wal_order:
            from milvus_cdc_spark.streaming.wal import WalGate

            self._gate = WalGate(
                changelog_path,
                os.path.join(checkpoint_dir, "wal_ledger.json"),
                # debezium topic dumps carry no parquet footers; their
                # files are named in topic order, so name order IS lsn
                # order (documented producer contract)
                order="lsn" if self.source == "parquet" else "name",
                range_fn=(
                    self._lsn_range_fn if self.source == "parquet" else None
                ),
            )
            # upgrade path: inherit a pre-gate checkpoint's delivered set
            # so historical files neither block nor collide epoch ids
            self._gate.bootstrap_from_checkpoint(checkpoint_dir)
        self._hist = None
        if self.history_path and self._gate is not None:
            from milvus_cdc_spark.sources.debezium import HistoryCursor

            self._hist = HistoryCursor(
                self.history_path,
                os.path.join(checkpoint_dir, "history_cursor.json"),
            )

    # -- the re-rooted plain-reader apply ---------------------------------
    def _lsn_range_fn(self, path: str):
        """Footer stats first; a schema'd Spark scan as the documented
        fallback for stat-less files. A parquet file with NO lsn values
        (a stray non-changelog file) resolves to the empty range so it
        applies immediately and the malformed-event policy owns it LOUDLY
        (fail/dlq) — silent queue-blocking is reserved for files that are
        genuinely unreadable (mid-write)."""
        from milvus_cdc_spark.streaming.wal import parquet_lsn_range

        rng = parquet_lsn_range(path)
        if rng is not None:
            return rng
        try:
            from pyspark.sql import functions as F

            from milvus_cdc_spark.schemas import CHANGELOG_SCHEMA

            r = (
                self.spark.read.schema(CHANGELOG_SCHEMA)
                .parquet(path)
                .agg(F.min("lsn"), F.max("lsn"))
                .collect()[0]
            )
            if r[0] is None:
                return (0, -1)
            return (int(r[0]), int(r[1]))
        except Exception:
            return None  # truly unreadable: keep blocking, retry next tick

    def _apply_files(
        self, files: list[str], epoch: int, with_history: bool = True
    ) -> None:
        """Apply one file-group as one epoch. The plain batch reader is a
        deliberate re-root: the FileStreamSource's relation bypasses the
        vectorized-scan fast path (measured 4-13x per-row CPU inflation on
        map columns), while the file list IS the group's exact,
        checkpoint-replayable identity — a pure physical swap with
        identical contents and semantics."""
        if self.source == "debezium":
            from milvus_cdc_spark.sources.debezium import _normalize

            batch_df = _normalize(self.spark.read.text(*files))
        else:
            from milvus_cdc_spark.schemas import CHANGELOG_SCHEMA

            batch_df = self.spark.read.schema(CHANGELOG_SCHEMA).parquet(*files)
        use_hist = self._hist is not None and with_history
        if use_hist:
            # CURSORED history decode: only not-yet-committed topic files
            # decode (sources/debezium.py::HistoryCursor); the cursor
            # advances AFTER the epoch commits, so a crash replays the
            # same DDL into the idempotent manifest (at-least-once)
            ev = self._hist.events(self.spark)
            if ev is not None:
                batch_df = batch_df.unionByName(ev)
        res = apply_batch(
            self.spark,
            self.table,
            batch_df,
            epoch,
            salt_partitions=self.salt_partitions,
            on_malformed=self.on_malformed,
            constraints=self.constraints,
            on_violation=self.on_violation,
        )
        # never advance the cursor past DDL a SKIPPED epoch did not apply
        # (an intent replay of an already-committed epoch must not eat
        # history files that arrived after the crash)
        if use_hist and not res.get("skipped"):
            self._hist.commit()

    def _gate_tick(self, delivered: list[str]) -> None:
        """Stage newly-delivered files, resolve any crash intent, apply
        every applicable group in lsn order. Runs inside foreachBatch and
        once at start() so a crash-parked intent or backlog drains even
        when the stream has nothing new to deliver."""
        self._gate.stage(delivered)
        it = self._gate.intent()
        if it is not None:
            ep, grp = it
            # idempotent: a group whose epoch already committed is skipped
            # by the manifest gate; otherwise this is the crash replay.
            # History stays OUT of intent replays — new topic files ride
            # the next fresh group instead (the engine tolerates DDL
            # arriving after its data via the bag/pending-widen paths)
            self._apply_files(grp, ep, with_history=False)
            self._gate.done(ep, grp)
        for ep, grp in self._gate.groups(
            self.max_files_per_trigger,
            # bounded drains form full-size epochs (wal.py groups()); the
            # continuous tail favors latency and applies partials
            hold_partial_tail=getattr(self, "_drain_mode", False),
        ):
            self._gate.begin(ep, grp)
            self._apply_files(grp, ep)
            self._gate.done(ep, grp)

    # -- lifecycle (reference C1-C4, server/cdc_api.go:26-36) -------------
    def start(self, available_now: bool = False):
        from milvus_cdc_spark.streaming.wal import delivered_files, local_path

        self._drain_mode = available_now
        if self._gate is not None:
            # drain any crash-parked intent/backlog before the stream runs
            self._gate_tick([])

        def _apply(batch_df, epoch_id: int):
            if self._gate is not None:
                files = delivered_files(self.checkpoint_dir, epoch_id)
                if files is None:
                    files = [local_path(u) for u in batch_df.inputFiles()]
                    if not files and not batch_df.isEmpty():
                        # data arrived but its file identity is unreadable
                        # (checkpoint source log not locally accessible):
                        # silently acking would strand the files as
                        # undelivered blockers forever — refuse loudly
                        raise RuntimeError(
                            f"wal_order=True requires a locally readable "
                            f"streaming checkpoint (no source log at "
                            f"{self.checkpoint_dir}/sources/0/{epoch_id}) "
                            "— move the checkpoint onto a shared POSIX "
                            "path or pass wal_order=False for order-"
                            "insensitive (patch-free) logs"
                        )
                self._gate_tick(files)
                self._maybe_compact(self.table)
                return
            files = batch_df.inputFiles()
            if files:  # ungated legacy path: re-root, apply as delivered
                if self.source == "debezium":
                    from milvus_cdc_spark.sources.debezium import _normalize

                    batch_df = _normalize(self.spark.read.text(*files))
                else:
                    batch_df = self.spark.read.schema(
                        batch_df.schema
                    ).parquet(*files)
            batch_df = _union_history(
                self.spark, batch_df, self.history_path
            )
            apply_batch(
                self.spark,
                self.table,
                batch_df,
                epoch_id,
                salt_partitions=self.salt_partitions,
                on_malformed=self.on_malformed,
                constraints=self.constraints,
                on_violation=self.on_violation,
            )
            self._maybe_compact(self.table)

        if self.source == "debezium":
            from milvus_cdc_spark.sources.debezium import (
                read_debezium_stream,
            )

            stream = read_debezium_stream(
                self.spark, self.changelog_path, self.max_files_per_trigger
            )
        elif self.source == "kafka":
            stream = _kafka_stream(
                self.spark, self.changelog_path, self.kafka_options,
                multi_table=False,
            )
        else:
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

    def _status_extra(self) -> dict[str, Any]:
        m = self.table.current()
        out = {
            "snapshot_id": m.snapshot_id,
            "table_version": m.version,
            "epochs_committed": len(m.epochs),
            "summary": m.summary,
        }
        if self._gate is not None:
            # files the stream delivered that the WAL gate is still
            # holding for an earlier-lsn file (0 on a drained log)
            out["wal_pending_files"] = self._gate.pending()
        return out


class CollectionFilter:
    """The should-read predicate at engine level: wildcard-or-list minus
    excludes, the reference's task collection model (a task replicates N
    named collections or '*' minus an exclude list,
    /root/reference/server/cdc_impl.go:1195-1208).

    ``includes=None`` means wildcard '*'. Namespaced collections are named
    ``<ns>.<table>``; a bare namespace name in ``excludes`` excludes every
    collection in it."""

    def __init__(
        self, includes: list[str] | None = None, excludes: list[str] | tuple = ()
    ):
        self.includes = list(includes) if includes is not None else None
        self.excludes = set(excludes)

    def _excluded(self, name: str) -> bool:
        ns = name.split(".", 1)[0]
        return name in self.excludes or (ns != name and ns in self.excludes)

    def should_read(self, name: str) -> bool:
        if self._excluded(name):
            return False
        return self.includes is None or name in self.includes

    def should_read_namespace(self, ns: str) -> bool:
        """Namespace DDL applies when ANY subscribed collection can live in
        the namespace: wildcard (minus an excluded ns), or an include entry
        under ``ns.``."""
        if self._excluded(ns):
            return False
        if self.includes is None:
            return True
        return any(i == ns or i.startswith(ns + ".") for i in self.includes)

    def predicate(self):
        """Spark Column form — pushed into the micro-batch scan so
        excluded collections' events are pruned before any shuffle.
        Namespace-level ops ride through (they're matched on the bare
        namespace name and re-checked driver-side)."""
        from pyspark.sql import functions as F

        from milvus_cdc_spark import schemas as S

        pred = F.lit(True)
        if self.includes is not None:
            pred = (
                F.col("table_name").isin(*self.includes)
                if self.includes
                else F.lit(False)  # explicit empty subscription reads nothing
            )
        if self.excludes:
            ex = sorted(self.excludes)
            pred = pred & ~F.col("table_name").isin(*ex)
            # prefix-exclude namespaced collections under an excluded ns
            from functools import reduce

            pred = pred & reduce(
                lambda acc, ns: acc
                & ~F.col("table_name").startswith(ns + "."),
                ex,
                F.lit(True),
            )
        # null table_name must REACH apply_multi's malformed gate (isin/
        # startswith on NULL yield NULL → the row would silently vanish
        # here instead of failing loudly or landing in the task dlq)
        return (
            pred
            | F.col("op").isin(*S.NAMESPACE_OPS)
            | F.col("table_name").isNull()
        )


class MultiCdcTask(_TaskLifecycle):
    """One replication task over a MULTIPLEXED changelog: N collections'
    events ride one ordered log (``table_name`` column); each micro-batch
    is split per collection and MERGEd into that collection's own
    SnapshotTable under ``tables_root/<name>`` (``tables_root/<ns>/<table>``
    for namespaced collections).

    The reference shape: a task owns several collection readers feeding
    shared channels (server/cdc_impl.go:1195-1208 collection discovery +
    should-read; core/reader/collection_reader.go). Exactly-once holds
    PER TABLE: each table's manifest has its own epoch gate, so a batch
    retried after a partial failure skips the tables that already
    committed and applies the rest.

    Per-collection MERGEs run CONCURRENTLY from a thread pool — Spark's
    scheduler interleaves the independent jobs, so batch wall time tracks
    max(per-table) instead of sum(per-table) (the reference applies
    collections concurrently, one goroutine per channel stream,
    core/reader/replicate_channel_manager.go:809-825). The single-writer
    commit protocol holds per table: each table's manifest has exactly one
    writer thread per batch.

    Namespace DDL (reference CreateDatabase/DropDatabase,
    core/writer/channel_writer.go:102-114): CREATE_NAMESPACE is an
    idempotent mkdir + marker; DROP_NAMESPACE records a namespace-level
    truncate watermark and fans a synthetic TRUNCATE event out to every
    table in the namespace — including tables FIRST SEEN in a later batch,
    which inherit the watermark on create, so late DML older than the drop
    loses under any batch ordering (the same strict-< watermark model as
    OP_TRUNCATE; see schemas.py).
    """

    NS_MARKER = "_namespace.json"

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
        max_concurrency: int = 8,
        write_mode: str = "cow",
        auto_compact_files: int | None = None,
        on_malformed: str = "fail",
        constraints: list[str] | None = None,
        on_violation: str = "fail",
        source: str = "parquet",
        history_path: str | None = None,
        wal_order: bool = True,
        kafka_options: dict | None = None,
    ):
        if source not in ("parquet", "debezium", "kafka"):
            raise ValueError(
                "source must be 'parquet', 'debezium', or 'kafka', got "
                f"{source!r}"
            )
        if history_path and source != "debezium":
            raise ValueError(
                "history_path only applies to source='debezium' (the "
                "native parquet/kafka changelogs carry DDL inline)"
            )
        if source == "kafka":
            if not (kafka_options or {}).get("bootstrap_servers"):
                raise ValueError(
                    "source='kafka' requires kafka_options with "
                    "'bootstrap_servers' (topic defaults to changelog_path)"
                )
        elif kafka_options:
            raise ValueError("kafka_options only applies to source='kafka'")
        self.spark = spark
        self.changelog_path = changelog_path
        self.on_malformed = on_malformed
        self.constraints = list(constraints or [])
        self.on_violation = on_violation
        self.source = source
        self.kafka_options = dict(kafka_options or {})
        # schema-change topic dir (see CdcTask) — decoded multi_table so
        # each event routes to its collection
        self.history_path = history_path
        self.tables_root = tables_root
        self.filter = CollectionFilter(collections, excludes)
        self.max_files_per_trigger = max_files_per_trigger
        self.salt_partitions = salt_partitions
        self.n_buckets = n_buckets
        self.write_mode = write_mode
        self.auto_compact_files = auto_compact_files
        self.max_concurrency = max_concurrency
        self.tables: dict[str, SnapshotTable] = {}
        self._init_lifecycle(checkpoint_dir)
        self.wal_order = wal_order and source != "kafka"
        self._gate = None
        if self.wal_order:  # see CdcTask: lsn-ordered batch formation
            from milvus_cdc_spark.streaming.wal import WalGate

            self._gate = WalGate(
                changelog_path,
                os.path.join(checkpoint_dir, "wal_ledger.json"),
                order="lsn" if source == "parquet" else "name",
                range_fn=(
                    self._lsn_range_fn if source == "parquet" else None
                ),
            )
            self._gate.bootstrap_from_checkpoint(checkpoint_dir)
        self._hist = None
        if self.history_path and self._gate is not None:
            from milvus_cdc_spark.sources.debezium import HistoryCursor

            self._hist = HistoryCursor(
                self.history_path,
                os.path.join(checkpoint_dir, "history_cursor.json"),
            )

    # -- naming / namespaces ----------------------------------------------
    def _table_path(self, name: str) -> str:
        segs = name.split(".")
        if len(segs) > 2 or any(
            (not s) or "/" in s or s.startswith((".", "_")) for s in segs
        ):
            raise ValueError(f"invalid collection name: {name!r}")
        return os.path.join(self.tables_root, *segs)

    def table(self, name: str) -> SnapshotTable:
        """Idempotent create-on-first-event (reference skip-if-exists,
        core/writer/milvus_handler.go:119-125). A table created inside a
        namespace that was ALREADY dropped inherits the namespace's
        truncate watermark via the synthetic-TRUNCATE injection in
        ``_per_table_batch`` (not here — create stays metadata-only)."""
        t = self.tables.get(name)
        if t is None:
            t = SnapshotTable(self._table_path(name))
            if not t.exists():
                t.create(
                    TRANSCRIPTS_BASE_COLUMNS, n_buckets=self.n_buckets,
                    write_mode=self.write_mode,
                )
            self.tables[name] = t
        return t

    def _ns_marker_path(self, ns: str) -> str:
        return os.path.join(self.tables_root, ns, self.NS_MARKER)

    def _ensure_namespace(self, ns: str) -> None:
        path = self._ns_marker_path(ns)
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write(json.dumps({"created_ts": time.time()}))
            os.replace(tmp, path)

    def _record_ns_drop(self, ns: str, ts, lsn: int) -> None:
        """Persist max(drop watermark) for the namespace — atomic replace,
        monotonic under replays (a crash-replayed batch re-records the
        same watermark)."""
        self._ensure_namespace(ns)
        path = self._ns_marker_path(ns)
        with open(path) as f:
            meta = json.loads(f.read())
        iso = ts.isoformat(sep=" ")
        if meta.get("drop_watermark") is None or iso > meta["drop_watermark"]:
            meta["drop_watermark"] = iso
            meta["drop_lsn"] = int(lsn)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write(json.dumps(meta))
            os.replace(tmp, path)

    def _ns_watermark(self, ns: str) -> tuple[str, int] | None:
        path = self._ns_marker_path(ns)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            meta = json.loads(f.read())
        if meta.get("drop_watermark") is None:
            return None
        return meta["drop_watermark"], int(meta["drop_lsn"])

    def _existing_tables_in_ns(self, ns: str) -> list[str]:
        d = os.path.join(self.tables_root, ns)
        if not os.path.isdir(d):
            return []
        return sorted(
            f"{ns}.{t}"
            for t in os.listdir(d)
            if os.path.exists(os.path.join(d, t, "meta", "CURRENT"))
        )

    def _truncate_row(self, iso_ts: str, lsn: int):
        """Synthetic TRUNCATE changelog row carrying a namespace-drop
        watermark into one table's apply. Reuses the drop event's real log
        lsn: globally unique in the source log, so the per-batch duplicate-
        lsn gate can never collide it with genuine DML."""
        from datetime import datetime

        from milvus_cdc_spark import schemas as S

        return self.spark.createDataFrame(
            [
                (
                    lsn,
                    datetime.fromisoformat(iso_ts),
                    0,
                    S.OP_TRUNCATE,
                    None, None, None, None, None,
                    "{}",
                    None,
                )
            ],
            S.CHANGELOG_SCHEMA,
        )

    # -- the per-batch fanout ----------------------------------------------
    def apply_multi(self, batch_df, epoch_id: int) -> None:
        """Split one multiplexed batch per collection and MERGE each slice
        concurrently. Public so batch-style callers (probes, backfills)
        can drive the same fanout the stream uses."""
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.sql import functions as F

        from milvus_cdc_spark import schemas as S

        batch_df = batch_df.filter(self.filter.predicate())
        # ONE bookkeeping scan: which subscribed collections actually have
        # rows in THIS batch (so an N-collection subscription doesn't
        # commit N empty epochs per trigger), plus the rare namespace ops
        # fixed-width maxes only (a max(struct) buffer would plan the whole
        # scan as SortAggregate — the 50-150µs/row cliff apply.py documents).
        # ns_drop_ts / ns_drop_lsn may come from different DROP events when
        # several hit one batch; the watermark only needs max(ts) plus SOME
        # real log lsn (uniqueness vs DML is what matters, see _truncate_row)
        info = (
            batch_df.groupBy("table_name")
            .agg(
                F.count(F.lit(1)).alias("n_all"),
                F.sum(
                    F.when(~F.col("op").isin(*S.NAMESPACE_OPS), 1).otherwise(0)
                ).alias("n_rows"),
                F.max(
                    F.when(F.col("op") == S.OP_DROP_NAMESPACE, F.col("ts"))
                ).alias("ns_drop_ts"),
                F.max(
                    F.when(F.col("op") == S.OP_DROP_NAMESPACE, F.col("lsn"))
                ).alias("ns_drop_lsn"),
                F.max(
                    F.when(F.col("op") == S.OP_CREATE_NAMESPACE, F.lit(True))
                ).alias("ns_create"),
            )
            .collect()
        )
        # events with a NULL table_name are unroutable — without this gate
        # they'd silently vanish (no per-table slice ever matches NULL).
        # fail mode raises BEFORE any per-table apply commits; dlq mode
        # quarantines them at the TASK level (<tables_root>/_dlq/epoch-N —
        # there is no table to own a per-table dlq) and routes the rest.
        null_grp = next((r for r in info if r["table_name"] is None), None)
        if null_grp is not None and null_grp["n_all"]:
            if self.on_malformed != "dlq":
                raise ValueError(
                    f"epoch {epoch_id}: {null_grp['n_all']} event(s) with "
                    "null table_name — unroutable; pass on_malformed='dlq' "
                    "to quarantine them and continue"
                )
            (
                batch_df.filter(F.col("table_name").isNull())
                .withColumn("_reason", F.lit("null table_name"))
                .write.mode("overwrite")
                .parquet(
                    os.path.join(
                        self.tables_root, "_dlq", f"epoch-{epoch_id}"
                    )
                )
            )
        names: set[str] = set()
        for r in info:
            nm = r["table_name"]
            if nm is None:
                continue  # quarantined (or raised) above
            if (r["ns_create"] or r["ns_drop_ts"] is not None) and (
                self.filter.should_read_namespace(nm)
            ):
                self._ensure_namespace(nm)
                if r["ns_drop_ts"] is not None:
                    self._record_ns_drop(nm, r["ns_drop_ts"], r["ns_drop_lsn"])
                    # the drop must also reach tables with NO rows in this
                    # batch — fan the watermark out to every existing table
                    names.update(
                        t
                        for t in self._existing_tables_in_ns(nm)
                        if self.filter.should_read(t)
                    )
            if r["n_rows"] and self.filter.should_read(nm):
                names.add(nm)

        ordered = sorted(names)
        # create-on-first-event OUTSIDE the pool: self.tables isn't locked
        tables = {n: self.table(n) for n in ordered}

        def one(name: str):
            df = batch_df.filter(F.col("table_name") == name).drop("table_name")
            if "." in name:
                wm = self._ns_watermark(name.split(".", 1)[0])
                if wm is not None:
                    df = df.unionByName(self._truncate_row(*wm))
            res = apply_batch(
                self.spark,
                tables[name],
                df,
                epoch_id,
                salt_partitions=self.salt_partitions,
                on_malformed=self.on_malformed,
                constraints=self.constraints,
                on_violation=self.on_violation,
            )
            self._maybe_compact(tables[name])
            return res

        if len(ordered) <= 1:
            for name in ordered:
                one(name)
            return
        with ThreadPoolExecutor(
            max_workers=min(self.max_concurrency, len(ordered))
        ) as ex:
            futures = [(n, ex.submit(one, n)) for n in ordered]
            errors = []
            for n, fut in futures:
                try:
                    fut.result()
                except Exception as e:  # collect, let siblings finish
                    errors.append((n, e))
            if errors:
                # fail the batch → streaming retry; per-table epoch gates
                # skip the tables that already committed
                name, err = errors[0]
                raise RuntimeError(
                    f"epoch {epoch_id}: {len(errors)} collection(s) failed, "
                    f"first = {name}"
                ) from err

    _lsn_range_fn = CdcTask._lsn_range_fn

    def _apply_files(
        self, files: list[str], epoch: int, with_history: bool = True
    ) -> None:
        """One file-group → one apply_multi epoch (plain-reader re-root,
        see CdcTask._apply_files)."""
        if self.source == "debezium":
            from milvus_cdc_spark.sources.debezium import _normalize

            batch_df = _normalize(
                self.spark.read.text(*files), multi_table=True
            )
        else:
            from milvus_cdc_spark.schemas import MULTI_CHANGELOG_SCHEMA

            batch_df = self.spark.read.schema(
                MULTI_CHANGELOG_SCHEMA
            ).parquet(*files)
        use_hist = self._hist is not None and with_history
        if use_hist:  # cursored decode, see CdcTask
            ev = self._hist.events(self.spark, multi_table=True)
            if ev is not None:
                batch_df = batch_df.unionByName(ev)
        self.apply_multi(batch_df, epoch)
        if use_hist:
            self._hist.commit()

    def _gate_tick(self, delivered: list[str]) -> None:
        """Identical protocol to CdcTask._gate_tick; apply_multi is
        idempotent per (table, epoch), which is what makes the intent
        replay safe. History stays out of intent replays (a skipped
        per-table epoch must not eat post-crash topic files)."""
        self._gate.stage(delivered)
        it = self._gate.intent()
        if it is not None:
            ep, grp = it
            self._apply_files(grp, ep, with_history=False)
            self._gate.done(ep, grp)
        for ep, grp in self._gate.groups(
            self.max_files_per_trigger,
            # bounded drains form full-size epochs (wal.py groups()); the
            # continuous tail favors latency and applies partials
            hold_partial_tail=getattr(self, "_drain_mode", False),
        ):
            self._gate.begin(ep, grp)
            self._apply_files(grp, ep)
            self._gate.done(ep, grp)

    def start(self, available_now: bool = False):
        from milvus_cdc_spark.streaming.wal import delivered_files, local_path

        self._drain_mode = available_now
        if self._gate is not None:
            self._gate_tick([])

        def _apply(batch_df, epoch_id: int):
            if self._gate is not None:
                files = delivered_files(self.checkpoint_dir, epoch_id)
                if files is None:
                    files = [local_path(u) for u in batch_df.inputFiles()]
                    if not files and not batch_df.isEmpty():
                        raise RuntimeError(  # see CdcTask: refuse loudly
                            f"wal_order=True requires a locally readable "
                            f"streaming checkpoint (no source log at "
                            f"{self.checkpoint_dir}/sources/0/{epoch_id})"
                            " — or pass wal_order=False for patch-free "
                            "logs"
                        )
                self._gate_tick(files)
                return
            files = batch_df.inputFiles()
            if files:  # same plain-reader re-root as CdcTask.start
                if self.source == "debezium":
                    from milvus_cdc_spark.sources.debezium import _normalize

                    batch_df = _normalize(
                        self.spark.read.text(*files), multi_table=True
                    )
                else:
                    batch_df = self.spark.read.schema(
                        batch_df.schema
                    ).parquet(*files)
            batch_df = _union_history(
                self.spark, batch_df, self.history_path, multi_table=True
            )
            self.apply_multi(batch_df, epoch_id)

        if self.source == "debezium":
            from milvus_cdc_spark.sources.debezium import (
                read_debezium_stream,
            )

            stream = read_debezium_stream(
                self.spark,
                self.changelog_path,
                self.max_files_per_trigger,
                multi_table=True,
            )
        elif self.source == "kafka":
            stream = _kafka_stream(
                self.spark, self.changelog_path, self.kafka_options,
                multi_table=True,
            )
        else:
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
        self._write_status("Running")
        return self.query

    def _status_extra(self) -> dict[str, Any]:
        out: dict[str, Any] = {"tables": {}}
        for name in sorted(self.tables):
            m = self.tables[name].current()
            out["tables"][name] = {
                "snapshot_id": m.snapshot_id,
                "table_version": m.version,
                "epochs_committed": len(m.epochs),
            }
        return out


class _LoopQuery:
    """Duck-typed StreamingQuery over a driver-side poll loop.

    ``CascadeTask``'s source is another SnapshotTable's manifest, not a
    Spark streaming source, so there is no real StreamingQuery to manage —
    this shim runs the poll loop on a thread and exposes the three members
    ``_TaskLifecycle`` actually uses (``awaitTermination``/``stop``/
    ``isActive``), so the ENTIRE task surface (drain_protected's
    fail-protect + cross-process pause polling, tail's duration loop,
    pause/resume, persisted status) works on a cascade unchanged. A loop
    exception surfaces from ``awaitTermination`` exactly like a
    StreamingQueryException would, which is what routes it into
    drain_protected's retry/trip path."""

    def __init__(self, fn: Callable[[threading.Event], None]):
        self._stop = threading.Event()
        self._done = threading.Event()
        self._exc: BaseException | None = None

        def _run():
            try:
                fn(self._stop)
            except BaseException as e:  # surfaced via awaitTermination
                self._exc = e
            finally:
                self._done.set()

        self._thread = threading.Thread(
            target=_run, name="cascade-loop", daemon=True
        )

    def start(self) -> "_LoopQuery":
        self._thread.start()
        return self

    @property
    def isActive(self) -> bool:
        return not self._done.is_set()

    def awaitTermination(self, timeout: float | None = None) -> bool:
        finished = self._done.wait(timeout)
        if finished and self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc
        return finished

    def stop(self) -> None:
        self._stop.set()
        self._thread.join()
        self._exc = None  # a pause() must not raise; drain paths re-raise


class CascadeTask(_TaskLifecycle):
    """Managed second-level replication: tail one SnapshotTable into
    another through its ``changes()`` diff, as a TASK with the same
    lifecycle every first-level tail has (create/drain/tail/pause/resume/
    position, fail-protect, cross-process pause) — the reference's
    always-on source→target topology (server/cdc_impl.go:213-320 runs
    replication as a managed task, not a one-shot), where the one-shot
    ``cascade`` CLI verb is its manual backfill cousin.

    Self-positioning: each hop commits under the SOURCE version as the
    target epoch (streaming/cascade.py), so the restart position is the
    target's own max applied epoch — no separate offset log, and a
    crash-replayed hop lands on the epoch gate and no-ops. availableNow
    semantics: drain until the target has caught the source's CURRENT,
    then stop; continuous mode keeps polling the source manifest (an O(1)
    int read) every ``poll_sec``."""

    def __init__(
        self,
        spark: SparkSession,
        src_root: str,
        table_root: str,
        checkpoint_dir: str,
        *,
        hop_versions: int | None = None,
        salt_partitions: int | None = None,
        n_buckets: int | None = None,
        write_mode: str = "cow",
        poll_sec: float = 0.5,
        auto_compact_files: int | None = None,
    ):
        self.spark = spark
        self.src = SnapshotTable(src_root)
        self.table = SnapshotTable(table_root)
        if not self.table.exists():
            from milvus_cdc_spark.streaming.cascade import create_target_like

            create_target_like(
                self.src, self.table,
                n_buckets=n_buckets, write_mode=write_mode,
            )
        self.hop_versions = hop_versions
        self.salt_partitions = salt_partitions
        self.poll_sec = poll_sec
        self.auto_compact_files = auto_compact_files
        self._init_lifecycle(checkpoint_dir)

    def _position(self) -> int:
        """Last replicated source version = max applied target epoch
        (bootstrap's reserved epoch −1 excluded)."""
        eps = [int(e) for e in self.table.current().epochs if int(e) >= 0]
        return max(eps) if eps else 0

    def start(self, available_now: bool = False):
        from milvus_cdc_spark.streaming.cascade import cascade_until_current

        def _loop(stop_event):
            while not stop_event.is_set():
                from_v = self._position()
                if self.src.current().version > from_v:
                    cascade_until_current(
                        self.spark,
                        self.src,
                        self.table,
                        from_v,
                        hop_versions=self.hop_versions,
                        salt_partitions=self.salt_partitions,
                    )
                    self._maybe_compact(self.table)
                elif available_now:
                    return
                else:
                    stop_event.wait(self.poll_sec)

        self.query = _LoopQuery(_loop).start()
        self._write_status("Running")
        return self.query

    def _status_extra(self) -> dict[str, Any]:
        m = self.table.current()
        src_v = self.src.current().version
        pos = self._position()
        return {
            "snapshot_id": m.snapshot_id,
            "table_version": m.version,
            "epochs_committed": len(m.epochs),
            "src_version": src_v,
            "replicated_src_version": pos,
            "versions_behind": max(0, src_v - pos),
            "summary": m.summary,
        }


class ViewTask(_TaskLifecycle):
    """Managed continuously-maintained serving view: tail a
    SnapshotTable's versions and advance a grouped-aggregate view store
    by each new ``changes()`` diff (operators/rollup.py::
    run_rollup_round) — the always-on cousin of the one-shot ``rollup``
    CLI verb, the same relation :class:`CascadeTask` has to ``cascade``.
    This closes the reference's actual end-to-end story: the point of
    replicating a collection is the serving view downstream of it, and
    here that view refreshes within ``poll_sec`` of every source commit,
    at O(|diff|) cost per refresh.

    Self-positioning: ``run_rollup_round``'s ``cursor.json`` IS the
    position (written last via temp + os.replace), so a crash-replayed
    round redoes itself idempotently and restart needs no extra state.
    availableNow semantics: drain until the view has caught the source's
    CURRENT version, then stop; continuous mode keeps polling the source
    manifest (an O(1) int read) every ``poll_sec``."""

    def __init__(
        self,
        spark: SparkSession,
        src_root: str,
        view_store: str,
        checkpoint_dir: str,
        *,
        poll_sec: float = 0.5,
    ):
        self.spark = spark
        self.src = SnapshotTable(src_root)
        self.view_store = view_store
        self.poll_sec = poll_sec
        self._init_lifecycle(checkpoint_dir)

    def _position(self) -> int:
        import json as _json

        cursor = os.path.join(self.view_store, "cursor.json")
        if not os.path.exists(cursor):
            return 0
        with open(cursor) as f:
            return int(_json.load(f)["version"])

    def start(self, available_now: bool = False):
        from milvus_cdc_spark.operators.rollup import run_rollup_round

        def _loop(stop_event):
            while not stop_event.is_set():
                if self.src.current().version > self._position():
                    run_rollup_round(self.spark, self.src, self.view_store)
                elif available_now:
                    return
                else:
                    stop_event.wait(self.poll_sec)

        self.query = _LoopQuery(_loop).start()
        self._write_status("Running")
        return self.query

    def _status_extra(self) -> dict[str, Any]:
        src_v = self.src.current().version
        pos = self._position()
        return {
            "src_version": src_v,
            "view_version": pos,
            "versions_behind": max(0, src_v - pos),
        }


class PublishTask(_TaskLifecycle):
    """Managed Debezium egress: tail a SnapshotTable's versions and
    publish each advance as envelope JSON lines
    (streaming/publish.py::publish_round) — the always-on cousin of the
    one-shot ``publish`` CLI verb, completing the task-family symmetry
    (ingest → CdcTask, table→table → CascadeTask, serving view →
    ViewTask, CDC feed out → this). Downstream consumers tail the out
    directory; the reference's users run a Kafka connector for exactly
    this hop.

    Self-positioning: publish_round's ``_cursor.json`` IS the position
    (committed last via temp + os.replace), so a crash-replayed round
    republishes the same files under the same names — consumers dedupe
    by filename or last-writer merge. availableNow semantics: publish
    until the feed has caught the source's CURRENT version, then stop;
    continuous mode polls the source manifest (an O(1) int read) every
    ``poll_sec``."""

    def __init__(
        self,
        spark: SparkSession,
        src_root: str,
        out_dir: str,
        checkpoint_dir: str,
        *,
        poll_sec: float = 0.5,
        n_files: int = 1,
    ):
        self.spark = spark
        self.src = SnapshotTable(src_root)
        self.out_dir = out_dir
        self.poll_sec = poll_sec
        self.n_files = n_files
        self._init_lifecycle(checkpoint_dir)

    def _position(self) -> int:
        import json as _json

        cursor = os.path.join(self.out_dir, "_cursor.json")
        if not os.path.exists(cursor):
            return 0
        with open(cursor) as f:
            return int(_json.load(f)["version"])

    def start(self, available_now: bool = False):
        from milvus_cdc_spark.streaming.publish import publish_round

        def _loop(stop_event):
            while not stop_event.is_set():
                if self.src.current().version > self._position():
                    publish_round(
                        self.spark, self.src, self.out_dir,
                        n_files=self.n_files,
                    )
                elif available_now:
                    return
                else:
                    stop_event.wait(self.poll_sec)

        self.query = _LoopQuery(_loop).start()
        self._write_status("Running")
        return self.query

    def _status_extra(self) -> dict[str, Any]:
        src_v = self.src.current().version
        pos = self._position()
        return {
            "src_version": src_v,
            "published_version": pos,
            "versions_behind": max(0, src_v - pos),
        }


class MultiCascadeTask(_TaskLifecycle):
    """Instance-level cascade: replicate EVERY SnapshotTable under
    ``src_tables_root`` (the dst tree of a MultiCdcTask — plain and
    ``ns.table`` namespaced dirs alike) into ``tables_root``, as ONE
    managed task. This is the reference's actual deployment shape — one
    whole Milvus (all collections) replicated into another
    (server/cdc_impl.go:213-320 iterates the instance's collections;
    '*'-subscription tasks are the norm, server/cdc_impl.go:1195-1208) —
    so the cascade surface has to speak it too, with the same
    ``collections``/``excludes`` subscription model the first-level
    MultiCdcTask uses.

    Discovery is per poll round: a collection created upstream mid-task
    starts replicating at the next round (no restart). Per-table hops run
    CONCURRENTLY on a bounded pool (wall ≈ max per-table diff, not the
    sum — same shape as MultiCdcTask.apply_multi); each table
    self-positions from its own target epochs, so tables catch up
    independently and a crash resumes each exactly where it stopped."""

    def __init__(
        self,
        spark: SparkSession,
        src_tables_root: str,
        tables_root: str,
        checkpoint_dir: str,
        *,
        collections: list[str] | None = None,
        excludes: list[str] | tuple = (),
        hop_versions: int | None = None,
        salt_partitions: int | None = None,
        write_mode: str = "cow",
        poll_sec: float = 0.5,
        auto_compact_files: int | None = None,
        max_concurrency: int = 8,
    ):
        self.spark = spark
        self.src_tables_root = src_tables_root
        self.tables_root = tables_root
        self.filter = CollectionFilter(collections, excludes)
        self.hop_versions = hop_versions
        self.salt_partitions = salt_partitions
        self.write_mode = write_mode
        self.poll_sec = poll_sec
        self.auto_compact_files = auto_compact_files
        self.max_concurrency = max_concurrency
        self._init_lifecycle(checkpoint_dir)

    def _pairs(self) -> list[tuple[str, SnapshotTable, SnapshotTable]]:
        from milvus_cdc_spark.streaming.registry import _walk_tables

        out = []
        for name, root in _walk_tables(self.src_tables_root):
            if not self.filter.should_read(name):
                continue
            dst = SnapshotTable(
                os.path.join(self.tables_root, *name.split("."))
            )
            out.append((name, SnapshotTable(root), dst))
        return out

    @staticmethod
    def _position(dst: SnapshotTable) -> int:
        eps = [int(e) for e in dst.current().epochs if int(e) >= 0]
        return max(eps) if eps else 0

    def _hop(self, src: SnapshotTable, dst: SnapshotTable) -> None:
        from milvus_cdc_spark.streaming.cascade import cascade_until_current

        if not dst.exists():
            from milvus_cdc_spark.streaming.cascade import create_target_like

            os.makedirs(os.path.dirname(dst.root), exist_ok=True)
            create_target_like(src, dst, write_mode=self.write_mode)
        cascade_until_current(
            self.spark,
            src,
            dst,
            self._position(dst),
            hop_versions=self.hop_versions,
            salt_partitions=self.salt_partitions,
        )
        self._maybe_compact(dst)

    def start(self, available_now: bool = False):
        from concurrent.futures import ThreadPoolExecutor

        def _loop(stop_event):
            while not stop_event.is_set():
                behind = [
                    (src, dst)
                    for _name, src, dst in self._pairs()
                    if not dst.exists()
                    or src.current().version > self._position(dst)
                ]
                if behind:
                    if len(behind) == 1:
                        self._hop(*behind[0])
                    else:
                        with ThreadPoolExecutor(
                            max_workers=min(self.max_concurrency, len(behind)),
                            thread_name_prefix="cascade-hop",
                        ) as pool:
                            futs = [
                                pool.submit(self._hop, s, d) for s, d in behind
                            ]
                            for f in futs:  # surface the FIRST failure
                                f.result()
                elif available_now:
                    return
                else:
                    stop_event.wait(self.poll_sec)

        self.query = _LoopQuery(_loop).start()
        self._write_status("Running")
        return self.query

    def _status_extra(self) -> dict[str, Any]:
        tables: dict[str, Any] = {}
        worst = 0
        for name, src, dst in self._pairs():
            src_v = src.current().version
            pos = self._position(dst) if dst.exists() else 0
            lag = max(0, src_v - pos)
            worst = max(worst, lag)
            tables[name] = {
                "src_version": src_v,
                "replicated_src_version": pos,
                "versions_behind": lag,
            }
        return {"tables": tables, "versions_behind": worst}


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
