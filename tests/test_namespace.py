"""Namespace (database) DDL through the multi-collection task.

Reference: CreateDatabase/DropDatabase replicate through the op-channel
dispatch map (/root/reference/core/writer/channel_writer.go:102-114,
idempotent create core/writer/milvus_handler.go:253-264; e2e create/drop-
database cases tests/testcases/test_cdc_sync_requests.py). Here namespace
ops ride the multiplexed log (table_name = bare namespace name), and
DROP_NAMESPACE becomes a truncate watermark fanned out to every table in
the namespace — including tables first seen AFTER the drop."""

import os
import threading
import time
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

import milvus_cdc_spark.streaming.engine as engine
from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.oracle import replay
from milvus_cdc_spark.sources import generate_changelog, write_changelog
from milvus_cdc_spark.streaming.engine import MultiCdcTask

def _ns_route():
    return (
        F.when(F.col("part") == 0, F.lit("ns0.t0"))
        .when(F.col("part") == 1, F.lit("ns0.t1"))
        .otherwise(F.lit("pub"))
    )


def _ns_event(spark, op, ns, lsn, ts):
    return spark.createDataFrame(
        [(lsn, ts, 0, op, None, None, None, None, None, None, None, ns)],
        S.MULTI_CHANGELOG_SCHEMA,
    )


def _table_rows(spark, task, name):
    return {
        (r["conv_id"], r["turn_idx"], r["text"], r["lsn"])
        for r in task.table(name).read(spark).collect()
    }


def _oracle_rows(events, trunc=None):
    if trunc is not None:
        t_ts, t_lsn = trunc
        events = events + [
            {"op": S.OP_TRUNCATE, "ts": t_ts, "lsn": t_lsn, "part": 0,
             "conv_id": None, "turn_idx": None, "role": None, "text": None,
             "tool": None, "ddl_arg": "{}", "extra": None}
        ]
    rows, _ = replay(events)
    return {(r["conv_id"], r["turn_idx"], r["text"], r["lsn"]) for r in rows}


def test_drop_namespace_defeats_late_dml(spark, tmp_path):
    """DROP_NAMESPACE mid-log; older-ts DML re-emitted AFTER the drop (higher
    lsn, older ts) must still lose in namespaced tables and win in 'pub'."""
    n = 2000
    base = generate_changelog(
        spark, n, n_parts=4, n_convs=24, evolve=False, drops=False,
        num_partitions=4,
    ).withColumn("table_name", _ns_route())
    cut = base.filter(F.col("lsn") < (n * 2) // 5)
    drop_ts = cut.agg(F.max("ts")).collect()[0][0]
    drop = _ns_event(spark, S.OP_DROP_NAMESPACE, "ns0", n, drop_ts)
    create = _ns_event(
        spark, S.OP_CREATE_NAMESPACE, "ns0", n + 1,
        drop_ts - timedelta(days=1),
    )
    late = cut.filter(F.col("op").isin(*S.DML_OPS)).withColumn(
        "lsn", F.col("lsn") + (n + 10)
    )
    log = base.unionByName(create).unionByName(drop).unionByName(late)

    log_dir = str(tmp_path / "log")
    write_changelog(log, log_dir, n_files=6)
    task = MultiCdcTask(
        spark, log_dir, str(tmp_path / "tables"), str(tmp_path / "ckpt"),
        max_files_per_trigger=2, n_buckets=4,
    )
    task.start(available_now=True)
    assert task.wait_drained()

    events = [r.asDict() for r in log.collect()]
    for name in ("ns0.t0", "ns0.t1"):
        ev = [e for e in events if e["table_name"] == name]
        assert _table_rows(spark, task, name) == _oracle_rows(
            ev, trunc=(drop_ts, n)
        ), name
    ev = [e for e in events if e["table_name"] == "pub"]
    assert _table_rows(spark, task, "pub") == _oracle_rows(ev)
    # the namespace marker persisted the watermark
    wm = task._ns_watermark("ns0")
    assert wm is not None and wm[0] == drop_ts.isoformat(sep=" ")


def test_table_created_after_drop_inherits_watermark(spark, tmp_path):
    """A table whose FIRST event arrives after its namespace was dropped
    must still apply the watermark: late DML older than the drop dies."""
    t0 = datetime(2024, 6, 1, 12, 0, 0)
    drop = _ns_event(spark, S.OP_DROP_NAMESPACE, "ns0", 100, t0)
    task = MultiCdcTask(
        spark, str(tmp_path / "log"), str(tmp_path / "tables"),
        str(tmp_path / "ckpt"), n_buckets=4,
    )
    task.apply_multi(drop, 0)
    assert task._existing_tables_in_ns("ns0") == []

    rows = [
        # older than the drop → dead; newer → survives
        (1, t0 - timedelta(hours=1), 0, S.OP_INSERT, "c1", 0, "user",
         "old", None, None, None, "ns0.t9"),
        (2, t0 + timedelta(hours=1), 0, S.OP_INSERT, "c1", 1, "user",
         "new", None, None, None, "ns0.t9"),
    ]
    late = spark.createDataFrame(rows, S.MULTI_CHANGELOG_SCHEMA)
    task.apply_multi(late, 1)
    got = _table_rows(spark, task, "ns0.t9")
    assert got == {("c1", 1, "new", 2)}


def test_excluded_namespace_is_ignored(spark, tmp_path):
    t0 = datetime(2024, 6, 1, 12, 0, 0)
    task = MultiCdcTask(
        spark, str(tmp_path / "log"), str(tmp_path / "tables"),
        str(tmp_path / "ckpt"), excludes=["ns0"], n_buckets=4,
    )
    batch = _ns_event(spark, S.OP_CREATE_NAMESPACE, "ns0", 1, t0).unionByName(
        spark.createDataFrame(
            [(2, t0, 0, S.OP_INSERT, "c1", 0, "user", "x", None, None, None,
              "ns0.t0"),
             (3, t0, 1, S.OP_INSERT, "c2", 0, "user", "y", None, None, None,
              "keep")],
            S.MULTI_CHANGELOG_SCHEMA,
        )
    )
    task.apply_multi(batch, 0)
    assert not os.path.exists(str(tmp_path / "tables" / "ns0"))
    assert _table_rows(spark, task, "keep") == {("c2", 0, "y", 3)}


def test_include_list_skips_collections_absent_from_batch(spark, tmp_path):
    """An explicit subscription must NOT commit empty epochs for
    collections with zero events in the batch (metadata churn at
    N-collection scale)."""
    t0 = datetime(2024, 6, 1, 12, 0, 0)
    task = MultiCdcTask(
        spark, str(tmp_path / "log"), str(tmp_path / "tables"),
        str(tmp_path / "ckpt"), collections=["a", "b"], n_buckets=4,
    )
    batch = spark.createDataFrame(
        [(1, t0, 0, S.OP_INSERT, "c1", 0, "user", "x", None, None, None, "a")],
        S.MULTI_CHANGELOG_SCHEMA,
    )
    task.apply_multi(batch, 0)
    assert os.path.exists(str(tmp_path / "tables" / "a" / "meta" / "CURRENT"))
    # 'b' saw no events: no table created, no empty epoch committed
    assert not os.path.exists(str(tmp_path / "tables" / "b"))


def test_collections_apply_concurrently(spark, tmp_path, monkeypatch):
    """≥4-collection batches fan out from a thread pool: per-table applies
    overlap (wall ≈ max per-table, not sum) — reference applies collections
    concurrently, replicate_channel_manager.go:809-825."""
    t0 = datetime(2024, 6, 1, 12, 0, 0)
    inflight = {"now": 0, "max": 0}
    lock = threading.Lock()

    spans = []

    def fake_apply(spark_, table, df, epoch, **kw):
        with lock:
            inflight["now"] += 1
            inflight["max"] = max(inflight["max"], inflight["now"])
        s = time.time()
        time.sleep(0.25)
        with lock:
            inflight["now"] -= 1
            spans.append((s, time.time()))
        return {"epoch": epoch, "skipped": False}

    monkeypatch.setattr(engine, "apply_batch", fake_apply)
    task = MultiCdcTask(
        spark, str(tmp_path / "log"), str(tmp_path / "tables"),
        str(tmp_path / "ckpt"), n_buckets=4,
    )
    rows = [
        (i, t0, 0, S.OP_INSERT, f"c{i}", 0, "user", "x", None, None, None,
         f"t{i}")
        for i in range(4)
    ]
    task.apply_multi(spark.createDataFrame(rows, S.MULTI_CHANGELOG_SCHEMA), 0)
    assert inflight["max"] >= 2, "per-collection applies never overlapped"
    # serialization check on the SLEEP SPAN only (total wall includes the
    # pre-pool bookkeeping Spark job, which is host-load-sensitive): four
    # 0.25s sleeps back-to-back would span >= 1.0s; overlapped, ~0.25s
    span = max(e for _s, e in spans) - min(s for s, _e in spans)
    assert span < 0.8, f"fanout looks serialized: sleep span {span:.2f}s"


def test_multi_task_lifecycle_status(spark, tmp_path):
    """MultiCdcTask now has the same persisted lifecycle CdcTask has
    (status file + drain_protected), so the registry/CLI can manage it."""
    n = 600
    log = generate_changelog(
        spark, n, n_parts=4, n_convs=10, evolve=False, drops=False,
        num_partitions=2,
    ).withColumn("table_name", _ns_route())
    log_dir = str(tmp_path / "log")
    write_changelog(log, log_dir, n_files=2)
    task = MultiCdcTask(
        spark, log_dir, str(tmp_path / "tables"), str(tmp_path / "ckpt"),
        max_files_per_trigger=2, n_buckets=4,
    )
    assert task.drain_protected(timeout_sec=300.0)
    st = task.status()
    assert st["state"] == "Stopped"
    assert set(st["tables"]) == {"ns0.t0", "ns0.t1", "pub"}
    for info in st["tables"].values():
        assert info["epochs_committed"] >= 1
