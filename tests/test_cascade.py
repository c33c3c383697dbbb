"""Cascaded (table→table) replication: a SnapshotTable's changes() diff
applied into a second table through the same apply_batch MERGE — the
reference's source→target topology (/root/reference/server/cdc_impl.go:
213-320) re-expressed lake-native. The invariant everywhere: the target
converges to the source's exact logical state, including schema
evolution replayed from the manifest diff."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.streaming.cascade import (
    cascade_epoch,
    cascade_until_current,
    changes_to_ops,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)


def _ev(lsn, conv, turn, text, sec, op="INSERT", part=0, tool=None,
        ddl_arg=None, extra=None):
    role = "user" if op in S.DML_OPS and op != S.OP_DELETE else None
    return (lsn, datetime(2024, 1, 1, 0, 0, sec), part, op, conv, turn,
            role, text, tool, ddl_arg, extra)


def _pair(spark, tmp_path, n_buckets=4):
    a = SnapshotTable(str(tmp_path / "a"))
    a.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=n_buckets)
    b = SnapshotTable(str(tmp_path / "b"))
    b.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=n_buckets)
    return a, b


def _state(spark, t, cols=("conv_id", "turn_idx", "text", "ts", "lsn")):
    # array columns come back as Python lists — tuple-ize so rows hash
    return {
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in t.read(spark).select(*cols).collect()
    }


def test_cascade_insert_update_delete_converges(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [
        _ev(1, "c1", 1, "one", 1), _ev(2, "c2", 1, "two", 1),
        _ev(3, "c3", 1, "three", 1),
    ]), 0)
    cascade_epoch(spark, a, b, 0, epoch=0)
    assert _state(spark, b) == _state(spark, a)
    # update c1, delete c2, insert c4
    apply_batch(spark, a, _mk(spark, [
        _ev(4, "c1", 1, "one-v2", 2, op=S.OP_UPSERT),
        _ev(5, "c2", 1, None, 2, op=S.OP_DELETE),
        _ev(6, "c4", 1, "four", 2),
    ]), 1)
    v1 = 1  # version after first cascade's source epoch
    cascade_epoch(spark, a, b, v1, epoch=1)
    got = _state(spark, b)
    assert got == _state(spark, a)
    assert not any(r[0] == "c2" for r in got)  # tombstone defeated the row


def test_cascade_delete_tombstone_loses_to_later_winner(spark, tmp_path):
    """The +1µs tombstone must NOT outrank a genuine later re-insert of
    the same key arriving in a later hop."""
    a, b = _pair(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [_ev(1, "c1", 1, "v1", 1)]), 0)
    cascade_epoch(spark, a, b, 0, epoch=0)
    apply_batch(spark, a, _mk(spark, [_ev(2, "c1", 1, None, 3, op=S.OP_DELETE)]), 1)
    cascade_epoch(spark, a, b, 1, epoch=1)
    assert _state(spark, b) == set()
    apply_batch(spark, a, _mk(spark, [_ev(3, "c1", 1, "v2", 5, op=S.OP_UPSERT)]), 2)
    cascade_epoch(spark, a, b, 2, epoch=2)
    assert _state(spark, b) == _state(spark, a)
    assert any(r[2] == "v2" for r in _state(spark, b))


def test_cascade_replays_schema_evolution(spark, tmp_path):
    """ADD + RENAME + WIDEN on the source over a hop must be synthesized
    onto the target from the manifest diff, and the evolved column
    values must travel (extra bag for adds, physical slot for renames)."""
    a, b = _pair(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [
        _ev(1, "c1", 1, "one", 1, tool="srch"),
    ]), 0)
    cascade_epoch(spark, a, b, 0, epoch=0)
    apply_batch(spark, a, _mk(spark, [
        _ev(2, None, None, None, 2, op=S.OP_ADD_COLUMN,
            ddl_arg='{"column":"score","type":"int"}'),
        _ev(3, None, None, None, 2, op=S.OP_RENAME_COLUMN,
            ddl_arg='{"from":"tool","to":"tool_name"}'),
        _ev(4, None, None, None, 2, op=S.OP_WIDEN_COLUMN,
            ddl_arg='{"column":"turn_idx","type":"bigint"}'),
        _ev(5, "c2", 1, "two", 2, op=S.OP_UPSERT, tool="calc",
            extra={"score": "7"}),
    ]), 1)
    cascade_epoch(spark, a, b, 1, epoch=1)
    cols = ("conv_id", "turn_idx", "text", "tool_name", "score", "lsn")
    sa = {tuple(r) for r in a.read(spark).select(*cols).collect()}
    sb = {tuple(r) for r in b.read(spark).select(*cols).collect()}
    assert sb == sa
    assert ("c2", 1, "two", "calc", 7, 5) in sb
    # pre-rename row's tool value must surface under the NEW name on B too
    assert ("c1", 1, "one", "srch", None, 1) in sb
    # widen replayed: target's logical type promoted
    bt = dict((b.current().logical_name(n), t) for n, t in b.current().columns)
    assert bt["turn_idx"] == "bigint"


def test_cascade_epoch_gate_is_idempotent(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [_ev(1, "c1", 1, "x", 1)]), 0)
    r1 = cascade_epoch(spark, a, b, 0)
    assert not r1.get("skipped")
    r2 = cascade_epoch(spark, a, b, 0)
    assert r2.get("skipped")
    assert _state(spark, b) == _state(spark, a)


def test_cascade_until_current_multi_hop(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    for i in range(4):
        apply_batch(spark, a, _mk(spark, [
            _ev(10 * i + j, f"c{i}_{j}", 1, f"t{i}{j}", i + 1)
            for j in range(1, 4)
        ]), i)
    hops = cascade_until_current(spark, a, b, 0, hop_versions=1)
    assert len(hops) == 4
    assert _state(spark, b) == _state(spark, a)
    # already caught up: no further hops
    assert cascade_until_current(spark, a, b, a.current().version) == []


def test_cascade_from_mor_source(spark, tmp_path):
    """changes() over a merge-on-read source feeds the cascade the same
    net diff; the target (CoW) still converges."""
    a = SnapshotTable(str(tmp_path / "a"))
    a.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode="mor")
    b = SnapshotTable(str(tmp_path / "b"))
    b.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    apply_batch(spark, a, _mk(spark, [
        _ev(1, "c1", 1, "x", 1), _ev(2, "c2", 1, "y", 1),
    ]), 0)
    cascade_epoch(spark, a, b, 0, epoch=0)
    apply_batch(spark, a, _mk(spark, [
        _ev(3, "c1", 1, "x2", 2, op=S.OP_UPSERT),
        _ev(4, "c2", 1, None, 2, op=S.OP_DELETE),
    ]), 1)
    cascade_epoch(spark, a, b, 1, epoch=1)
    assert _state(spark, b) == _state(spark, a)


def test_cli_cascade_self_positions(spark, tmp_path, capsys):
    """CLI verb: first invocation creates the target (source's logical
    schema) and backfills from version 0; a second invocation after more
    source epochs self-positions from the target's applied epochs and
    replicates only the new span; a third is a no-op."""
    import json as _json

    from milvus_cdc_spark.streaming.cli import main as cli_main

    a = SnapshotTable(str(tmp_path / "src"))
    a.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    apply_batch(spark, a, _mk(spark, [
        _ev(1, "c1", 1, "x", 1), _ev(2, "c2", 1, "y", 1),
    ]), 0)
    dst_root = str(tmp_path / "dst")
    args = ["cascade", "--src-table", a.root, "--table", dst_root]
    assert cli_main(args) == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["from_version"] == 0 and len(out1["hops"]) == 1

    apply_batch(spark, a, _mk(spark, [
        _ev(3, "c1", 1, "x2", 2, op=S.OP_UPSERT),
        _ev(4, "c2", 1, None, 2, op=S.OP_DELETE),
    ]), 1)
    assert cli_main(args) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["from_version"] == out1["caught_up_to"]
    assert len(out2["hops"]) == 1

    b = SnapshotTable(dst_root)
    assert _state(spark, b) == _state(spark, a)

    assert cli_main(args) == 0
    out3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["hops"] == []


def test_changes_to_ops_shapes(spark, tmp_path):
    a = SnapshotTable(str(tmp_path / "a"))
    a.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    apply_batch(spark, a, _mk(spark, [_ev(1, "c1", 1, "x", 1)]), 0)
    apply_batch(spark, a, _mk(spark, [
        _ev(2, "c1", 1, None, 2, op=S.OP_DELETE),
        _ev(3, "c2", 1, "y", 2),
    ]), 1)
    ops = changes_to_ops(a.changes(spark, 1)).collect()
    by_op = {r["op"]: r for r in ops}
    assert set(by_op) == {S.OP_DELETE, S.OP_UPSERT}
    d = by_op[S.OP_DELETE]
    assert d["conv_id"] == "c1" and d["text"] is None
    assert d["ts"].microsecond == 1  # +1µs tombstone bump
    u = by_op[S.OP_UPSERT]
    assert (u["conv_id"], u["text"], u["lsn"]) == ("c2", "y", 3)


def test_cascade_vector_column(spark, tmp_path):
    """A FLOAT_VECTOR payload cascades: the source table carries an
    `array<float>` column, the hop synthesizes ADD_COLUMN array<float> on
    the target, and vector values travel the JSON bag (changes_to_ops
    _bag_encode → manifest.bag_decode) — the milvus topology with the
    milvus payload type."""
    import json as _json

    a = SnapshotTable(str(tmp_path / "a"))
    a.create(S.TRANSCRIPTS_BASE_COLUMNS + [("embedding", "array<float>")],
             n_buckets=4)
    b = SnapshotTable(str(tmp_path / "b"))
    b.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)

    def vev(lsn, conv, text, sec, op="INSERT", vec=None):
        extra = None if op == S.OP_DELETE else {
            "embedding": _json.dumps(vec or [float(lsn), 2.0])}
        return _ev(lsn, conv, 1, text, sec, op=op, extra=extra)

    apply_batch(spark, a, _mk(spark, [
        vev(1, "c1", "one", 1), vev(2, "c2", "two", 1),
    ]), 0)
    cascade_epoch(spark, a, b, 0, epoch=0)
    cols = ("conv_id", "turn_idx", "text", "embedding")
    assert _state(spark, b, cols) == _state(spark, a, cols)
    assert dict(b.read(spark).dtypes)["embedding"] == "array<float>"
    # update flips the vector; delete removes; both cascade
    apply_batch(spark, a, _mk(spark, [
        vev(10, "c1", "one-v2", 5, op=S.OP_UPSERT, vec=[9.0, 9.0]),
        vev(11, "c2", None, 5, op=S.OP_DELETE),
    ]), 1)
    cascade_epoch(spark, a, b, 1, epoch=1)
    got = _state(spark, b, cols)
    assert got == _state(spark, a, cols)
    assert got == {("c1", 1, "one-v2", (9.0, 9.0))} or got == {
        ("c1", 1, "one-v2", [9.0, 9.0])}


def test_cascade_snapshot_bootstrap_after_vacuum(spark, tmp_path):
    """A fresh target whose diff base has been expired by the source's
    vacuum takes a snapshot_hop bootstrap (full current snapshot as one
    epoch at the current version) and then continues incrementally.
    (Regression: cascade_until_current(…, 0) used to crash with a raw
    FileNotFoundError once v0's manifest was vacuumed.)"""
    from milvus_cdc_spark.streaming.cascade import create_target_like

    a = SnapshotTable(str(tmp_path / "a"))
    a.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    for i in range(4):
        apply_batch(spark, a, _mk(spark, [
            _ev(10 * i + j, f"c{i}_{j}", 1, f"t{i}{j}", i + 1)
            for j in range(1, 4)
        ]), i)
    a.vacuum(keep_versions=2, min_age_sec=0)
    with pytest.raises(FileNotFoundError):
        a.at_version(0)

    b = SnapshotTable(str(tmp_path / "b"))
    create_target_like(a, b)
    hops = cascade_until_current(spark, a, b, 0)
    assert len(hops) == 1 and hops[0].get("snapshot_bootstrap")
    assert hops[0]["to_version"] == a.current().version
    assert _state(spark, b) == _state(spark, a)

    # the tail continues incrementally from the bootstrap position
    apply_batch(spark, a, _mk(spark, [
        _ev(100, "c0_1", 1, "updated", 9, op="UPSERT"),
        _ev(101, "c1_1", 1, None, 9, op="DELETE"),
    ]), 5)
    from_v = max(int(e) for e in b.current().epochs if int(e) >= 0)
    hops2 = cascade_until_current(spark, a, b, from_v)
    assert len(hops2) == 1 and not hops2[0].get("snapshot_bootstrap")
    assert _state(spark, b) == _state(spark, a)

    # re-run of the bootstrap is a no-op (epoch gate)
    c = SnapshotTable(str(tmp_path / "c"))
    create_target_like(a, c)
    cascade_until_current(spark, a, c, 0)
    before = c.current().version
    again = cascade_until_current(spark, a, c, 0)
    assert again == [] or again[0].get("skipped")
    assert c.current().version == before


def test_cascade_expired_base_with_stale_target_fails_loudly(spark, tmp_path):
    """A target that already holds state but is positioned below the
    source's earliest retained version must NOT silently diff from a
    later base (rows untouched since the expired base would never
    arrive) — it raises a clear error instead."""
    from milvus_cdc_spark.streaming.cascade import consumer_pin_name

    a, b = _pair(spark, tmp_path)
    apply_batch(spark, a, _mk(spark, [_ev(1, "c1", 1, "x", 1)]), 0)
    cascade_until_current(spark, a, b, 0)  # target now at v1
    for i in range(1, 5):
        apply_batch(spark, a, _mk(spark, [
            _ev(10 + i, f"c{i}", 1, f"t{i}", i + 1)
        ]), i)
    # the hop's retention pin would floor the vacuum — this scenario is
    # the UNPINNED one (operator dropped it / pre-pinning replica)
    assert a.unpin(consumer_pin_name(b.root, "cascade"))
    a.vacuum(keep_versions=2, min_age_sec=0)
    pos = max(int(e) for e in b.current().epochs if int(e) >= 0)
    assert pos < a.earliest_retained_version()
    with pytest.raises(ValueError, match="expired by vacuum"):
        cascade_until_current(spark, a, b, pos)


def test_fresh_target_mirrors_source_rename_history(spark, tmp_path):
    """A target created from a source WITH rename history must mirror
    the source's physical layout + rename map: wire envelopes carry
    renamed-column values in their physical slots, so a target whose
    physical column were the post-rename logical name would silently
    drop them. (Regression for the create-from-logical-names bug.)"""
    from milvus_cdc_spark.streaming.cascade import create_target_like

    a = SnapshotTable(str(tmp_path / "a"))
    a.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    apply_batch(spark, a, _mk(spark, [
        _ev(1, None, None, None, 1, op=S.OP_RENAME_COLUMN,
            ddl_arg='{"from":"tool","to":"tool_name"}'),
        _ev(2, "c1", 1, "hello", 1, tool="srch"),
    ]), 0)
    b = SnapshotTable(str(tmp_path / "b"))
    create_target_like(a, b)
    bm = b.current()
    assert dict(bm.renames) == {"tool": "tool_name"}
    assert "tool" in {n for n, _t in bm.columns}
    cascade_until_current(spark, a, b, 0)
    cols = ("conv_id", "turn_idx", "text", "tool_name", "lsn")
    assert _state(spark, b, cols) == _state(spark, a, cols)
    got = {r["tool_name"] for r in b.read(spark).collect()}
    assert got == {"srch"}
