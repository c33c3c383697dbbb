"""CascadeTask: source→target replication as a MANAGED task — the
reference runs replication continuously under task lifecycle verbs
(/root/reference/server/cdc_impl.go:213-320 with the pause/resume/
position surface of server/cdc_api.go:26-36); here the same lifecycle
(`_TaskLifecycle`) drives a poll loop over the source table's manifest
instead of a Structured Streaming query, via the `_LoopQuery` shim."""

import json
from datetime import datetime

import pytest

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.streaming.cli import main as cli_main
from milvus_cdc_spark.streaming.engine import CascadeTask, FailProtect
from milvus_cdc_spark.streaming.registry import TaskRegistry


def _mk(spark, rows):
    return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)


def _ev(lsn, conv, turn, text, sec, op="INSERT", part=0):
    role = "user" if op in S.DML_OPS and op != S.OP_DELETE else None
    return (lsn, datetime(2024, 1, 1, 0, 0, sec), part, op, conv, turn,
            role, text, None, None, None)


def _state(spark, t):
    return {
        (r.conv_id, r.turn_idx, r.text)
        for r in t.read(spark).select("conv_id", "turn_idx", "text").collect()
    }


def _src(spark, tmp_path, name="src"):
    a = SnapshotTable(str(tmp_path / name))
    a.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    return a


def test_cascade_task_drain_converges_and_is_idempotent(spark, tmp_path):
    a = _src(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [
        _ev(1, "c1", 1, "one", 1), _ev(2, "c2", 1, "two", 1),
    ]), 0)
    apply_batch(spark, a, _mk(spark, [
        _ev(3, "c1", 1, "one-v2", 2, op=S.OP_UPSERT),
        _ev(4, "c2", 1, None, 2, op=S.OP_DELETE),
        _ev(5, "c3", 1, "three", 2),
    ]), 1)

    task = CascadeTask(
        spark, a.root, str(tmp_path / "dst"), str(tmp_path / "ckpt")
    )
    assert task.drain_protected(FailProtect(), timeout_sec=120)
    assert _state(spark, task.table) == _state(spark, a)
    st = task.status()
    assert st["versions_behind"] == 0
    assert st["replicated_src_version"] == a.current().version
    v_after = task.table.current().version

    # nothing new upstream: a second drain is a no-op (no new commits)
    assert task.drain_protected(FailProtect(), timeout_sec=120)
    assert task.table.current().version == v_after

    # new source epochs: the next drain catches up from its own position
    apply_batch(spark, a, _mk(spark, [_ev(6, "c4", 1, "four", 3)]), 2)
    assert task.drain_protected(FailProtect(), timeout_sec=120)
    assert _state(spark, task.table) == _state(spark, a)


def test_cascade_task_continuous_tail_catches_live_writes(spark, tmp_path):
    import time

    a = _src(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [_ev(1, "c1", 1, "one", 1)]), 0)
    task = CascadeTask(
        spark, a.root, str(tmp_path / "dst"), str(tmp_path / "ckpt"),
        poll_sec=0.1,
    )
    task.start()  # continuous mode
    try:
        deadline = time.time() + 60
        while task.status()["versions_behind"] > 0:
            assert time.time() < deadline, task.status()
            time.sleep(0.2)
        # a LIVE source write while the loop is polling
        apply_batch(spark, a, _mk(spark, [_ev(2, "c2", 1, "two", 2)]), 1)
        while _state(spark, task.table) != _state(spark, a):
            assert time.time() < deadline, task.status()
            time.sleep(0.2)
    finally:
        task.pause()
    assert task.query is None  # pause() stopped and released the loop
    assert task.status()["persisted_state"] == "Paused"
    # resume drains cleanly from its own position
    assert task.drain_protected(FailProtect(), timeout_sec=120)
    assert _state(spark, task.table) == _state(spark, a)


def test_cascade_task_cross_process_pause_stops_drain(spark, tmp_path):
    a = _src(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [_ev(1, "c1", 1, "one", 1)]), 0)
    reg = TaskRegistry(str(tmp_path / "tasks"))
    spec = reg.create("casc", {
        "src_table": a.root, "table": str(tmp_path / "dst"),
        "checkpoint": str(tmp_path / "ckpt"),
    })
    task = CascadeTask(spark, a.root, spec["table"], spec["checkpoint"])
    reg.request_pause("casc")  # pause requested before the drain starts
    ok = task.drain_protected(
        FailProtect(), timeout_sec=60,
        pause_check=lambda: reg.pause_requested("casc"),
    )
    assert not ok
    assert task.status()["persisted_state"] == "Paused"
    reg.clear_pause("casc")
    assert task.drain_protected(FailProtect(), timeout_sec=120)
    assert _state(spark, task.table) == _state(spark, a)


def test_cascade_task_loop_error_routes_to_fail_protect(spark, tmp_path):
    """A hop failure surfaces through awaitTermination like a streaming
    error: fail-protect trips to Paused with the reason recorded."""
    a = _src(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [_ev(1, "c1", 1, "one", 1)]), 0)
    task = CascadeTask(
        spark, a.root, str(tmp_path / "dst"), str(tmp_path / "ckpt")
    )

    def _boom(*args, **kw):
        raise RuntimeError("injected hop failure")

    import milvus_cdc_spark.streaming.cascade as casc
    orig = casc.cascade_until_current
    casc.cascade_until_current = _boom
    try:
        ok = task.drain_protected(
            FailProtect(max_failures=2, backoff_sec=0.05), timeout_sec=60
        )
    finally:
        casc.cascade_until_current = orig
    assert not ok
    assert "injected hop failure" in task.status()["reason"]
    # after the cause clears, resume converges
    assert task.drain_protected(FailProtect(), timeout_sec=120)
    assert _state(spark, task.table) == _state(spark, a)


def test_cascade_task_registry_position_reports_lag(spark, tmp_path):
    a = _src(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [_ev(1, "c1", 1, "one", 1)]), 0)
    apply_batch(spark, a, _mk(spark, [_ev(2, "c2", 1, "two", 2)]), 1)
    reg = TaskRegistry(str(tmp_path / "tasks"))
    reg.create("casc", {
        "src_table": a.root, "table": str(tmp_path / "dst"),
        "checkpoint": str(tmp_path / "ckpt"),
    })
    task = CascadeTask(spark, a.root, str(tmp_path / "dst"),
                       str(tmp_path / "ckpt"))
    assert task.drain_protected(FailProtect(), timeout_sec=120)
    pos = reg.position("casc")
    assert pos["versions_behind"] == 0
    assert pos["src_version"] == a.current().version
    # source moves ahead; position (no Spark) sees the lag
    apply_batch(spark, a, _mk(spark, [_ev(3, "c3", 1, "three", 3)]), 2)
    pos = reg.position("casc")
    assert pos["versions_behind"] > 0


def test_cascade_task_registry_validation(tmp_path):
    reg = TaskRegistry(str(tmp_path / "tasks"))
    with pytest.raises(ValueError, match="'table'"):
        reg.create("bad", {"src_table": "/x", "checkpoint": "/c"})
    with pytest.raises(ValueError, match="'src_table' or 'src_tables_root'"):
        reg.create("bad2", {"table": "/t", "checkpoint": "/c"})
    with pytest.raises(ValueError, match="'tables_root'"):
        reg.create("bad3", {"src_tables_root": "/x", "checkpoint": "/c"})


def test_cli_cascade_task_lifecycle(spark, tmp_path, capsys):
    """create --src-table → drain --name → position --name, end to end
    through the CLI (one verb set for first-level and cascade tasks)."""
    a = _src(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [
        _ev(1, "c1", 1, "one", 1), _ev(2, "c2", 1, "two", 1),
    ]), 0)
    tasks = str(tmp_path / "tasks")
    dst = str(tmp_path / "dst")
    common = ["--name", "casc", "--tasks-dir", tasks]
    assert cli_main([
        "create", *common, "--src-table", a.root, "--table", dst,
        "--checkpoint", str(tmp_path / "ckpt"), "--master", "local[4]",
    ]) == 0
    capsys.readouterr()
    assert cli_main(["drain", *common, "--master", "local[4]"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["drained"] and out["versions_behind"] == 0
    assert cli_main(["position", *common]) == 0
    pos = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pos["versions_behind"] == 0
    assert _state(spark, SnapshotTable(dst)) == _state(spark, a)


# ---- instance-level (multi-collection) cascade -------------------------

from milvus_cdc_spark.streaming.engine import MultiCascadeTask


def _tree(spark, tmp_path):
    """Source tree: alpha + gamma at depth 1, ns1.beta namespaced."""
    root = tmp_path / "srcroot"
    tabs = {}
    for name in ("alpha", "gamma", "ns1.beta"):
        t = SnapshotTable(str(root.joinpath(*name.split("."))))
        t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2)
        tabs[name] = t
    apply_batch(spark, tabs["alpha"], _mk(spark, [_ev(1, "a1", 1, "A", 1)]), 0)
    apply_batch(spark, tabs["gamma"], _mk(spark, [_ev(1, "g1", 1, "G", 1)]), 0)
    apply_batch(spark, tabs["ns1.beta"], _mk(spark, [_ev(1, "b1", 1, "B", 1)]), 0)
    return str(root), tabs


def test_multi_cascade_replicates_whole_tree(spark, tmp_path):
    src_root, tabs = _tree(spark, tmp_path)
    task = MultiCascadeTask(
        spark, src_root, str(tmp_path / "dstroot"), str(tmp_path / "ckpt"),
        excludes=["gamma"],
    )
    assert task.drain_protected(FailProtect(), timeout_sec=300)
    dst_alpha = SnapshotTable(str(tmp_path / "dstroot" / "alpha"))
    dst_beta = SnapshotTable(str(tmp_path / "dstroot" / "ns1" / "beta"))
    assert _state(spark, dst_alpha) == _state(spark, tabs["alpha"])
    assert _state(spark, dst_beta) == _state(spark, tabs["ns1.beta"])
    # excluded collection is never materialized on the target
    assert not (tmp_path / "dstroot" / "gamma").exists()
    st = task.status()
    assert st["versions_behind"] == 0
    assert set(st["tables"]) == {"alpha", "ns1.beta"}

    # upstream moves: one table gets an epoch, a brand-NEW table appears
    apply_batch(spark, tabs["alpha"], _mk(spark, [
        _ev(2, "a2", 1, "A2", 2)]), 1)
    delta = SnapshotTable(str(tmp_path / "srcroot" / "delta"))
    delta.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2)
    apply_batch(spark, delta, _mk(spark, [_ev(1, "d1", 1, "D", 1)]), 0)
    assert task.status()["versions_behind"] > 0
    assert task.drain_protected(FailProtect(), timeout_sec=300)
    assert _state(spark, dst_alpha) == _state(spark, tabs["alpha"])
    assert _state(
        spark, SnapshotTable(str(tmp_path / "dstroot" / "delta"))
    ) == _state(spark, delta)


def test_multi_cascade_registry_position_per_table_lag(spark, tmp_path):
    src_root, tabs = _tree(spark, tmp_path)
    reg = TaskRegistry(str(tmp_path / "tasks"))
    reg.create("mc", {
        "src_tables_root": src_root,
        "tables_root": str(tmp_path / "dstroot"),
        "checkpoint": str(tmp_path / "ckpt"),
    })
    task = MultiCascadeTask(
        spark, src_root, str(tmp_path / "dstroot"), str(tmp_path / "ckpt")
    )
    assert task.drain_protected(FailProtect(), timeout_sec=300)
    pos = reg.position("mc")
    assert pos["versions_behind"] == 0
    assert all(
        t["versions_behind"] == 0 for t in pos["tables"].values()
    )
    apply_batch(spark, tabs["gamma"], _mk(spark, [
        _ev(2, "g2", 1, "G2", 2)]), 1)
    pos = reg.position("mc")
    assert pos["versions_behind"] > 0
    assert pos["tables"]["gamma"]["versions_behind"] > 0
    assert pos["tables"]["alpha"]["versions_behind"] == 0


def test_cli_multi_cascade_lifecycle(spark, tmp_path, capsys):
    src_root, tabs = _tree(spark, tmp_path)
    tasks = str(tmp_path / "tasks")
    common = ["--name", "mc", "--tasks-dir", tasks]
    assert cli_main([
        "create", *common, "--src-tables-root", src_root,
        "--tables-root", str(tmp_path / "dstroot"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--excludes", "gamma", "--master", "local[4]",
    ]) == 0
    capsys.readouterr()
    assert cli_main(["drain", *common, "--master", "local[4]"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["drained"] and out["versions_behind"] == 0
    assert _state(
        spark, SnapshotTable(str(tmp_path / "dstroot" / "alpha"))
    ) == _state(spark, tabs["alpha"])
    assert not (tmp_path / "dstroot" / "gamma").exists()
    # maintenance verbs walk the replicated tree too
    assert cli_main([
        "compact", *common, "--master", "local[4]",
    ]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(res) == {"alpha", "ns1.beta"}
