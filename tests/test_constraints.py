"""Ingest-time data-quality constraints: user-declared Spark SQL
predicates enforced at apply with SQL CHECK semantics (FALSE violates,
UNKNOWN passes). Default is fail-before-commit (the reference's
pause-on-error stance); ``on_violation='dlq'`` quarantines violating
events with the failed expression as ``_reason`` and applies the rest —
the quality gate a training-data pipeline wants at the door, so garbage
never reaches downstream incremental consumers.
"""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.plans.manifest import SnapshotTable, dlq_summary_dir


def _mk(spark, rows):
    return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)


def _ev(lsn, conv, turn, sec, role="user", text="ok", op="INSERT", part=0):
    if op == S.OP_DELETE:
        role = text = None
    return (lsn, datetime(2024, 1, 1, 0, 0, sec), part, op, conv, turn,
            role, text, None, None, None)


def _tbl(spark, tmp_path, name="t", write_mode="cow"):
    t = SnapshotTable(str(tmp_path / name))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode=write_mode)
    return t


def _state(spark, t):
    return {
        (r.conv_id, r.turn_idx, r.text)
        for r in t.read(spark).select("conv_id", "turn_idx", "text").collect()
    }


ROLES = "role IN ('user','assistant','system','tool')"
LEN = "length(text) <= 5"


def test_default_fails_loudly_on_violation(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    batch = _mk(spark, [
        _ev(1, "c1", 1, 1),
        _ev(2, "c2", 1, 1, role="bot"),
    ])
    with pytest.raises(ValueError, match="violate declared constraints"):
        apply_batch(spark, t, batch, 0, constraints=[ROLES])
    assert "0" not in t.current().epochs  # nothing committed


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
def test_dlq_quarantines_violations_applies_rest(spark, tmp_path, write_mode):
    t = _tbl(spark, tmp_path, write_mode=write_mode)
    batch = _mk(spark, [
        _ev(1, "c1", 1, 1),
        _ev(2, "c2", 1, 1, role="bot"),            # violates ROLES
        _ev(3, "c3", 1, 1, text="waytoolong"),     # violates LEN
        _ev(4, "c4", 1, 1, text="tiny"),
    ])
    res = apply_batch(
        spark, t, batch, 0,
        constraints=[ROLES, LEN], on_violation="dlq",
    )
    assert res["n_violation"] == 2 and res["n_dlq"] == 2
    assert res["n_events"] == 2
    assert _state(spark, t) == {("c1", 1, "ok"), ("c4", 1, "tiny")}
    summary = dlq_summary_dir(t.dlq_dir)
    reasons = summary["epoch-0"]
    assert reasons == {
        f"constraint violated: {ROLES}": 1,
        f"constraint violated: {LEN}": 1,
    }


def test_check_semantics_null_passes(spark, tmp_path):
    """UNKNOWN (null) passes — a PATCH that doesn't carry the column and
    a DELETE (no payload) are never misjudged; the patch's own carried
    column IS judged."""
    t = _tbl(spark, tmp_path)
    apply_batch(
        spark, t,
        _mk(spark, [_ev(1, "c1", 1, 1), _ev(2, "c2", 1, 1)]),
        0, constraints=[LEN],
    )
    batch = _mk(spark, [
        # patch WITHOUT text: LEN is null → passes
        (3, datetime(2024, 1, 1, 0, 0, 2), 0, "PATCH", "c1", 1, None, None,
         "hammer", None, None),
        # delete: no payload at all → passes
        _ev(4, "c2", 1, 2, op="DELETE"),
        # patch WITH an over-long text → judged, quarantined
        (5, datetime(2024, 1, 1, 0, 0, 2), 0, "PATCH", "c1", 1, None,
         "waytoolong", None, None, None),
    ])
    res = apply_batch(
        spark, t, batch, 1, constraints=[LEN], on_violation="dlq",
    )
    assert res["n_violation"] == 1
    rows = {r.conv_id: r for r in t.read(spark).collect()}
    assert set(rows) == {"c1"}
    assert rows["c1"].text == "ok" and rows["c1"].tool == "hammer"


def test_mixed_malformed_and_violations_coexist_in_dlq(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    batch = _mk(spark, [
        _ev(1, "c1", 1, 1),
        (2, datetime(2024, 1, 1), 0, "INSERT", None, 1, "user", "x",
         None, None, None),                         # malformed: null key
        _ev(3, "c3", 1, 1, role="bot"),             # constraint violation
    ])
    res = apply_batch(
        spark, t, batch, 0,
        on_malformed="dlq", constraints=[ROLES], on_violation="dlq",
    )
    assert res["n_dlq"] == 2 and res["n_violation"] == 1
    assert _state(spark, t) == {("c1", 1, "ok")}
    reasons = dlq_summary_dir(t.dlq_dir)["epoch-0"]
    assert reasons == {
        "null key (conv_id/turn_idx)": 1,
        f"constraint violated: {ROLES}": 1,
    }


def test_streaming_drain_with_constraints(spark, tmp_path):
    """CdcTask enforces constraints every micro-batch: the drain
    converges on the clean events; violations land in the DLQ."""
    from milvus_cdc_spark.sources import write_changelog
    from milvus_cdc_spark.streaming.engine import CdcTask

    events = [_ev(i, f"c{i % 7}", i % 3, i % 50) for i in range(1, 61)]
    events += [_ev(100 + i, f"b{i}", 1, 1, role="bot") for i in range(4)]
    write_changelog(_mk(spark, events), str(tmp_path / "log"), n_files=4)
    task = CdcTask(
        spark, str(tmp_path / "log"), str(tmp_path / "t"),
        str(tmp_path / "ck"), n_buckets=4, max_files_per_trigger=2,
        constraints=[ROLES], on_violation="dlq",
    )
    task.start(available_now=True)
    assert task.wait_drained(180)
    t = SnapshotTable(str(tmp_path / "t"))
    got = _state(spark, t)
    assert got == {(f"c{i % 7}", i % 3, "ok") for i in range(1, 61)}
    quarantined = sum(
        sum(v.values()) for v in dlq_summary_dir(t.dlq_dir).values()
    )
    assert quarantined == 4


def test_cli_create_stores_constraints(spark, tmp_path):
    from milvus_cdc_spark.sources import generate_changelog, write_changelog
    from milvus_cdc_spark.streaming.cli import main
    from milvus_cdc_spark.streaming.registry import TaskRegistry

    write_changelog(
        generate_changelog(spark, 100, evolve=False, drops=False),
        str(tmp_path / "log"), n_files=2,
    )
    rc = main(["create", "--name", "gated", "--tasks-dir",
               str(tmp_path / "tasks"),
               "--log", str(tmp_path / "log"),
               "--table", str(tmp_path / "t"),
               "--checkpoint", str(tmp_path / "ck"),
               "--constraint", ROLES, "--constraint", LEN,
               "--on-violation", "dlq"])
    assert rc == 0
    spec = TaskRegistry(str(tmp_path / "tasks")).get("gated")
    assert spec["constraints"] == [ROLES, LEN]
    assert spec["on_violation"] == "dlq"


def test_quarantine_replay_does_not_duplicate_dlq(spark, tmp_path):
    """Crash-replay of an epoch that quarantined bad DDL + violations
    (but no structurally-malformed rows) must land the SAME dlq contents,
    not append duplicates — the epoch dir is cleared once per run before
    any quarantine class writes. (Regression: the violation write used
    'append' whenever n_dlq>0, so a bad-DDL-only epoch never cleared the
    dir and a replay doubled every violating row.)"""
    t = _tbl(spark, tmp_path)
    batch = _mk(spark, [
        _ev(1, "c1", 1, 1),
        _ev(2, "c2", 1, 1, role="bot"),  # constraint violation
        (3, datetime(2024, 1, 1), 0, "ADD_COLUMN", None, None, None, None,
         None, "not-json", None),        # bad DDL, no malformed DML
    ])
    kw = dict(
        on_malformed="dlq", constraints=[ROLES], on_violation="dlq",
    )
    apply_batch(spark, t, batch, 0, **kw)
    first = dlq_summary_dir(t.dlq_dir)["epoch-0"]
    assert sum(first.values()) == 2
    # crash window: epoch's dlq written but the commit "lost" — rollback
    # reopens the epoch, the replay must overwrite, not double
    t.rollback(0)
    res = apply_batch(spark, t, batch, 0, **kw)
    assert not res.get("skipped")
    assert dlq_summary_dir(t.dlq_dir)["epoch-0"] == first
    assert _state(spark, t) == {("c1", 1, "ok")}
