"""DROP_COLUMN (Iceberg drop-column evolution) with NAME-RETIREMENT
convergence semantics: the column leaves the logical schema metadata-only
(no file rewrite), a later ADD_COLUMN on the retired name is a documented
no-op, the result is identical under any batch ordering (the retired set
is monotone under union), stored pre-drop values can never resurface, key
and system columns are protected, and retirement survives compaction /
MOR folding / rollback.

Reference analogue: schema changes ride the same replicated op channel as
the rest of the DDL (core/reader/etcd_op.go:609-660); the drop semantics
themselves follow the Iceberg format spec's drop-column evolution (old
data files simply stop projecting the column), hardened to retirement so
convergence holds without field ids.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.oracle import replay
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources import generate_changelog


def _row(lsn, op, conv=None, turn=None, text=None, ddl=None, extra=None,
         sec=0, tool=None):
    role = "user" if op in (S.OP_INSERT, S.OP_UPSERT) else None
    return (
        lsn, datetime(2024, 1, 1, 0, 0, sec), 0, op, conv, turn, role,
        text, tool, ddl, extra,
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)


def _cols(table):
    m = table.current()
    return [m.logical_name(c) for c, _ in m.columns]


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    return t


def test_drop_base_payload_column(spark, table):
    """Dropping `tool` removes it from the schema; stored values stay in
    the old files but never project; later DML's tool values discard."""
    apply_batch(
        spark, table,
        _mk(spark, [_row(1, "INSERT", "c1", 1, "a", tool="T1", sec=1),
                    _row(2, "INSERT", "c2", 2, "b", tool="T2", sec=2)]),
        0,
    )
    apply_batch(
        spark, table,
        _mk(spark, [_row(10, "DROP_COLUMN", ddl='{"column":"tool"}', sec=3)]),
        1,
    )
    assert "tool" not in _cols(table)
    assert "tool" in table.current().dropped
    # a later epoch's events still carry tool in the changelog — discarded
    apply_batch(
        spark, table,
        _mk(spark, [_row(20, "UPSERT", "c3", 3, "c", tool="T3", sec=4)]),
        2,
    )
    df = table.read(spark)
    assert "tool" not in df.columns
    assert sorted(r["text"] for r in df.collect()) == ["a", "b", "c"]


def test_readd_after_drop_is_noop(spark, table):
    """Name retirement: ADD_COLUMN on a dropped name never comes back —
    neither the column nor any pre-drop value (no resurrection)."""
    apply_batch(
        spark, table,
        _mk(spark, [_row(1, "INSERT", "c1", 1, "a", tool="T1", sec=1)]),
        0,
    )
    apply_batch(
        spark, table,
        _mk(spark, [_row(10, "DROP_COLUMN", ddl='{"column":"tool"}', sec=2),
                    _row(11, "ADD_COLUMN",
                         ddl='{"column":"tool","type":"string"}', sec=3)]),
        1,
    )
    assert "tool" not in _cols(table)
    # and in a LATER epoch too
    apply_batch(
        spark, table,
        _mk(spark, [_row(20, "ADD_COLUMN",
                         ddl='{"column":"tool","type":"string"}', sec=4)]),
        2,
    )
    assert "tool" not in _cols(table)
    assert "tool" not in table.read(spark).columns


def test_drop_added_column_and_bag_never_resurfaces(spark, table):
    """Drop of an evolved (ADD_COLUMN) column: later events still carrying
    the key in their dynamic bag must not resurface it."""
    apply_batch(
        spark, table,
        _mk(spark, [_row(1, "ADD_COLUMN",
                         ddl='{"column":"score","type":"int"}', sec=1),
                    _row(2, "INSERT", "c1", 1, "a", extra={"score": "7"},
                         sec=2)]),
        0,
    )
    assert "score" in _cols(table)
    apply_batch(
        spark, table,
        _mk(spark, [_row(10, "DROP_COLUMN", ddl='{"column":"score"}', sec=3),
                    _row(11, "UPSERT", "c2", 2, "b", extra={"score": "9"},
                         sec=4)]),
        1,
    )
    df = table.read(spark)
    assert "score" not in df.columns
    assert sorted(r["text"] for r in df.collect()) == ["a", "b"]


def test_out_of_order_drop_and_add_converge(spark, table):
    """The retirement invariant: DROP in one batch, ADD in another —
    either application order ends with the column absent, matching the
    sequential oracle's retirement fold."""
    t2 = SnapshotTable(table.root + "_rev")
    t2.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    b_data = [_row(1, "INSERT", "c1", 1, "a", sec=1)]
    b_add = [_row(10, "ADD_COLUMN", ddl='{"column":"score","type":"int"}',
                  sec=2)]
    b_drop = [_row(20, "DROP_COLUMN", ddl='{"column":"score"}', sec=3)]
    apply_batch(spark, table, _mk(spark, b_data), 0)
    apply_batch(spark, table, _mk(spark, b_add), 1)
    apply_batch(spark, table, _mk(spark, b_drop), 2)
    apply_batch(spark, t2, _mk(spark, b_data), 0)
    apply_batch(spark, t2, _mk(spark, b_drop), 1)
    apply_batch(spark, t2, _mk(spark, b_add), 2)
    assert _cols(table) == _cols(t2)
    assert "score" not in _cols(table)
    got1 = sorted(map(tuple, table.read(spark).collect()))
    got2 = sorted(map(tuple, t2.read(spark).collect()))
    assert got1 == got2
    # oracle agrees: the in-order fold retires the name the same way
    rows, cols = replay([
        {"op": r[3], "conv_id": r[4], "turn_idx": r[5], "role": r[6],
         "text": r[7], "tool": r[8], "ts": r[1], "part": r[2], "lsn": r[0],
         "ddl_arg": r[9], "extra": r[10]}
        for r in b_data + b_add + b_drop
    ])
    assert "score" not in cols


def test_drop_renamed_column_retires_physical_slot(spark, table):
    """rename tool→impl, then drop impl: the physical slot retires too, so
    ADD tool afterwards is also a no-op (no resurrection path)."""
    apply_batch(
        spark, table,
        _mk(spark, [_row(1, "INSERT", "c1", 1, "a", tool="T1", sec=1),
                    _row(2, "RENAME_COLUMN",
                         ddl='{"from":"tool","to":"impl"}', sec=2)]),
        0,
    )
    assert "impl" in _cols(table)
    apply_batch(
        spark, table,
        _mk(spark, [_row(10, "DROP_COLUMN", ddl='{"column":"impl"}', sec=3)]),
        1,
    )
    m = table.current()
    assert "impl" not in _cols(table)
    assert "impl" in m.dropped and "tool" in m.dropped
    apply_batch(
        spark, table,
        _mk(spark, [_row(20, "ADD_COLUMN",
                         ddl='{"column":"tool","type":"string"}', sec=4)]),
        2,
    )
    assert "tool" not in _cols(table)


def test_protected_column_drop_quarantines(spark, table):
    apply_batch(
        spark, table,
        _mk(spark, [_row(1, "INSERT", "c1", 1, "a", sec=1)]),
        0,
    )
    bad = _mk(spark, [_row(10, "DROP_COLUMN",
                           ddl='{"column":"conv_id"}', sec=2)])
    with pytest.raises(ValueError, match="malformed"):
        apply_batch(spark, table, bad, 1)
    # dlq mode quarantines and applies the rest
    res = apply_batch(spark, table, bad, 1, on_malformed="dlq")
    assert res["n_dlq"] == 1
    assert "conv_id" in _cols(table)


def test_drop_matches_oracle_on_generated_log(spark, table):
    """Full replay parity: generated log + a mid-log DROP_COLUMN(tool) —
    engine final state must equal the sequential oracle fold."""
    log = generate_changelog(spark, 3000, n_parts=4, n_convs=50,
                             turns_per_conv=8)
    mid_ts = log.filter(F.col("lsn") == 1500).collect()[0]["ts"]
    drop = _mk(spark, [(
        100000, mid_ts, 0, "DROP_COLUMN", None, None, None, None, None,
        '{"column":"tool"}', None,
    )])
    full = log.unionByName(drop)
    apply_batch(spark, table, full.filter(F.col("lsn") < 1500), 0)
    apply_batch(spark, table,
                full.filter((F.col("lsn") >= 1500) & (F.col("lsn") < 100000)),
                1)
    apply_batch(spark, table, full.filter(F.col("lsn") >= 100000), 2)
    want_rows, want_cols = replay([r.asDict() for r in full.collect()])
    df = table.read(spark)
    assert sorted(df.columns) == sorted(want_cols)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["lsn"])
        for r in df.collect()
    )
    want = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["lsn"])
        for r in want_rows
    )
    assert got == want


def test_changes_and_time_travel_across_drop(spark, table):
    """changes() across a drop aligns on the NEW schema (dropped column
    absent, incl. on delete pre-images); time travel to a pre-drop
    version still projects the column with its stored values (the
    Iceberg-snapshot property: old manifests are immutable)."""
    apply_batch(
        spark, table,
        _mk(spark, [_row(1, "INSERT", "c1", 1, "a", tool="T1", sec=1),
                    _row(2, "INSERT", "c2", 2, "b", tool="T2", sec=2)]),
        0,
    )
    v0 = table._current_version()
    apply_batch(
        spark, table,
        _mk(spark, [_row(10, "DROP_COLUMN", ddl='{"column":"tool"}', sec=3),
                    _row(11, "DELETE", "c1", 1, sec=4),
                    _row(12, "INSERT", "c3", 3, "c", sec=5)]),
        1,
    )
    diff = table.changes(spark, v0)
    assert "tool" not in diff.columns
    got = {(r["change_type"], r["conv_id"]) for r in diff.collect()}
    assert got == {("delete", "c1"), ("insert", "c3")}
    # pre-drop snapshot still carries the column and its values
    old = table.read(spark, manifest=table.at_version(v0))
    assert sorted((r["conv_id"], r["tool"]) for r in old.collect()) == [
        ("c1", "T1"), ("c2", "T2")
    ]


def test_drop_survives_compaction_and_mor(spark, tmp_path):
    """Retirement is carried by every maintenance rewrite; the MOR write
    path applies drops identically."""
    t = SnapshotTable(str(tmp_path / "mor"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode="mor")
    apply_batch(
        spark, t,
        _mk(spark, [_row(1, "INSERT", "c1", 1, "a", tool="T1", sec=1)]),
        0,
    )
    apply_batch(
        spark, t,
        _mk(spark, [_row(10, "DROP_COLUMN", ddl='{"column":"tool"}', sec=2),
                    _row(11, "INSERT", "c2", 2, "b", tool="T2", sec=3)]),
        1,
    )
    assert "tool" not in t.read(spark).columns
    t.compact(spark)
    m = t.current()
    assert "tool" in m.dropped and "tool" not in [c for c, _ in m.columns]
    apply_batch(
        spark, t,
        _mk(spark, [_row(20, "ADD_COLUMN",
                         ddl='{"column":"tool","type":"string"}', sec=4)]),
        2,
    )
    assert "tool" not in t.read(spark).columns
    assert sorted(r["text"] for r in t.read(spark).collect()) == ["a", "b"]
