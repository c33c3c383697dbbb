"""Regressions for the round-1 engine-core review findings: typed schema
evolution, rename chains, at-least-once duplicate events, and manifest
summary/snapshot-id integrity."""

import datetime

from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources import generate_changelog

TS0 = datetime.datetime(2024, 1, 1)


def _ev(lsn, op, conv="c0", turn=0, part=0, text=None, ddl_arg=None, extra=None,
        ts_off=0):
    return (
        lsn, TS0 + datetime.timedelta(seconds=ts_off), part, op, conv, turn,
        "user" if op in ("INSERT", "UPSERT") else None, text, None, ddl_arg,
        extra,
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)


def _table(tmp_path, name="t", n_buckets=4):
    t = SnapshotTable(str(tmp_path / name))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=n_buckets, overwrite=True)
    return t


def test_typed_add_column_roundtrips(spark, tmp_path):
    """ADD_COLUMN with type=int must write int parquet data matching the
    manifest schema — not strings that wedge every later read."""
    t = _table(tmp_path)
    batch = _df(spark, [
        _ev(0, "ADD_COLUMN", ddl_arg='{"column":"score","type":"int"}', ts_off=0),
        _ev(1, "INSERT", text="hello", extra={"score": "41"}, ts_off=1),
        _ev(2, "UPSERT", text="world", extra={"score": "42"}, ts_off=2),
    ])
    apply_batch(spark, t, batch, epoch=0)
    rows = t.read(spark).collect()
    assert len(rows) == 1
    assert rows[0]["score"] == 42 and isinstance(rows[0]["score"], int)
    # a second epoch (re-read of the typed files) must also work
    apply_batch(
        spark, t,
        _df(spark, [_ev(3, "UPSERT", text="again", extra={"score": "43"}, ts_off=3)]),
        epoch=1,
    )
    assert t.read(spark).collect()[0]["score"] == 43


def test_unknown_add_column_type_degrades_to_string(spark, tmp_path):
    t = _table(tmp_path)
    apply_batch(spark, t, _df(spark, [
        _ev(0, "ADD_COLUMN", ddl_arg='{"column":"w","type":"float128"}'),
        _ev(1, "INSERT", text="x", extra={"w": "1.5"}, ts_off=1),
    ]), epoch=0)
    assert dict(t.current().columns)["w"] == "string"
    assert t.read(spark).collect()[0]["w"] == "1.5"


def test_rename_chain_one_batch_equals_two_batches(spark, tmp_path):
    """a→b then b→c inside one batch must resolve to the same physical
    mapping as the same chain split across two batches."""
    one = _table(tmp_path, "one")
    apply_batch(spark, one, _df(spark, [
        _ev(0, "INSERT", text="x"),
        _ev(1, "RENAME_COLUMN", ddl_arg='{"from":"tool","to":"tool_name"}', ts_off=1),
        _ev(2, "RENAME_COLUMN", ddl_arg='{"from":"tool_name","to":"tool_label"}', ts_off=2),
    ]), epoch=0)

    two = _table(tmp_path, "two")
    apply_batch(spark, two, _df(spark, [
        _ev(0, "INSERT", text="x"),
        _ev(1, "RENAME_COLUMN", ddl_arg='{"from":"tool","to":"tool_name"}', ts_off=1),
    ]), epoch=0)
    apply_batch(spark, two, _df(spark, [
        _ev(2, "RENAME_COLUMN", ddl_arg='{"from":"tool_name","to":"tool_label"}', ts_off=2),
    ]), epoch=1)

    assert one.current().renames == two.current().renames == {"tool": "tool_label"}
    assert "tool_label" in one.read(spark).columns
    assert "tool_label" in two.read(spark).columns


def test_duplicate_add_column_in_one_batch(spark, tmp_path):
    """At-least-once delivery may replay ADD_COLUMN twice in one batch —
    must not produce duplicate columns or an ambiguous-reference crash."""
    t = _table(tmp_path)
    apply_batch(spark, t, _df(spark, [
        _ev(0, "ADD_COLUMN", ddl_arg='{"column":"x"}'),
        _ev(1, "ADD_COLUMN", ddl_arg='{"column":"x"}', ts_off=1),
        _ev(2, "INSERT", text="v", extra={"x": "1"}, ts_off=2),
    ]), epoch=0)
    cols = [c for c, _ in t.current().columns]
    assert cols.count("x") == 1
    assert t.read(spark).collect()[0]["x"] == "1"


def test_duplicate_lsn_fails_loudly(spark, tmp_path):
    """lsn is the log offset — uniqueness is the dedup contract. A batch
    violating it must STOP the task with a clear reason (reference
    pause-on-error), never silently corrupt the table."""
    import pytest

    dup = _df(spark, [
        _ev(5, "INSERT", text="only-once"),
        _ev(5, "INSERT", text="only-once"),
    ])
    t = _table(tmp_path)
    with pytest.raises(ValueError, match="duplicate lsn"):
        apply_batch(spark, t, dup, epoch=0)
    # nothing committed — a corrected batch under the same epoch succeeds
    assert not t.committed_epoch(0)
    apply_batch(spark, t, _df(spark, [_ev(5, "INSERT", text="only-once")]), epoch=0)
    rows = t.read(spark).collect()
    assert len(rows) == 1 and rows[0]["text"] == "only-once"


def test_last_epoch_is_absolute_not_summed(spark, tmp_path):
    t = _table(tmp_path)
    log = generate_changelog(spark, 400, n_parts=2, n_convs=5, turns_per_conv=3)
    for e in range(4):
        apply_batch(
            spark, t,
            log.filter((F.col("lsn") >= e * 100) & (F.col("lsn") < (e + 1) * 100)),
            epoch=e,
        )
    assert t.current().summary["last_epoch"] == 3


def test_compact_snapshot_id_distinct_from_create(spark, tmp_path):
    t = _table(tmp_path)
    apply_batch(
        spark, t,
        generate_changelog(spark, 200, n_parts=2, n_convs=5, turns_per_conv=3),
        epoch=0,
    )
    ids = {t.at_version(v).snapshot_id for v in range(t.current().version + 1)}
    m = t.compact(spark)
    assert m.snapshot_id not in ids
