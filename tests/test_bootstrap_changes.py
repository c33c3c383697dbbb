"""Snapshot bootstrap (initial full load → changelog-tail handover,
apply.bootstrap_table) and the incremental-read diff
(SnapshotTable.changes — Iceberg changelog-scan analogue).

Reference context: milvus-cdc replicates forward from a position and
expects pre-existing data to be copied out of band (server/cdc_impl.go:
371-497); bootstrap closes that gap inside the same merge machinery.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch, bootstrap_table
from milvus_cdc_spark.oracle import replay
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources import (
    generate_changelog,
    read_changelog,
    write_changelog,
)

N = 2400


@pytest.fixture(scope="module")
def changelog(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("blog") / "events")
    df = generate_changelog(
        spark, N, n_parts=4, n_convs=40, turns_per_conv=20, num_partitions=8
    )
    write_changelog(df, path, n_files=8)
    return path


def _state_rows(table, spark):
    df = table.read(spark)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect()), cols


def test_bootstrap_plus_tail_equals_full_replay(spark, changelog, tmp_path):
    log = read_changelog(spark, changelog)
    mid = N // 2
    older = [r.asDict() for r in log.filter(F.col("lsn") <= mid).collect()]
    snapshot_rows, snap_cols = replay(older)
    # the pre-existing table: the sequential fold of the older half,
    # loaded back through Spark exactly as a user's parquet would be
    snap_df = spark.createDataFrame(
        [tuple(r[c] for c in snap_cols) for r in snapshot_rows],
        ", ".join(
            f"{c} {'int' if c in ('turn_idx', 'part') else 'bigint' if c == 'lsn' else 'timestamp' if c == 'ts' else 'string'}"
            for c in snap_cols
        ),
    )
    t = SnapshotTable(str(tmp_path / "transcripts"))
    res = bootstrap_table(spark, t, snap_df, n_buckets=4)
    assert res["epoch"] == -1 and not res["skipped"]
    # replaying the bootstrap epoch is a no-op (crash-safe initial load)
    assert bootstrap_table(spark, t, snap_df, n_buckets=4)["skipped"]
    apply_batch(spark, t, log.filter(F.col("lsn") > mid), epoch=0)

    expected_rows, _ = replay([r.asDict() for r in log.collect()])
    got, cols = _state_rows(t, spark)
    exp = sorted(tuple(r[c] for c in cols) for r in expected_rows)
    assert got == exp


def test_bootstrap_defaults_missing_columns(spark, tmp_path):
    # a bare (conv_id, turn_idx, text) dataset: ts defaults to epoch 0 so
    # ANY real tail event wins; lsn defaults negative-unique so the
    # duplicate-lsn gate passes and ordering stays sound
    snap = spark.createDataFrame(
        [("c1", 1, "old"), ("c2", 2, "keep")],
        "conv_id string, turn_idx int, text string",
    )
    t = SnapshotTable(str(tmp_path / "transcripts"))
    bootstrap_table(spark, t, snap, n_buckets=4)
    tail = spark.createDataFrame(
        [(100, datetime(2024, 1, 1), 0, S.OP_UPSERT, "c1", 1, "user",
          "new", None, None, None)],
        S.CHANGELOG_SCHEMA,
    )
    apply_batch(spark, t, tail, epoch=0)
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in t.read(spark).collect()}
    assert got == {("c1", 1): "new", ("c2", 2): "keep"}


def test_bootstrap_extra_columns_ride_dynamic_bag(spark, tmp_path):
    # snapshot columns beyond the base schema behave like post-ADD_COLUMN
    # payloads: recovered once the tail's ADD_COLUMN lands
    snap = spark.createDataFrame(
        [("c1", 1, "hello", "9")],
        "conv_id string, turn_idx int, text string, score string",
    )
    t = SnapshotTable(str(tmp_path / "transcripts"))
    bootstrap_table(spark, t, snap, n_buckets=4)
    add = spark.createDataFrame(
        [(200, datetime(2024, 1, 1), 0, S.OP_ADD_COLUMN, None, None, None,
          None, None, '{"column":"score","type":"int"}', None)],
        S.CHANGELOG_SCHEMA,
    )
    apply_batch(spark, t, add, epoch=0)
    row = t.read(spark).select("conv_id", "score").collect()[0]
    assert (row["conv_id"], row["score"]) == ("c1", 9)


def test_changes_insert_update_delete(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)

    def mk(rows):
        return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)

    def row(lsn, op, conv, turn, text, sec):
        role = "user" if op != S.OP_DELETE else None
        return (lsn, datetime(2024, 1, 1, 0, 0, sec), 0, op, conv, turn,
                role, text, None, None, None)

    apply_batch(spark, t, mk([
        row(1, "INSERT", "c1", 1, "a", 1),
        row(2, "INSERT", "c2", 2, "b", 2),
        row(3, "INSERT", "c3", 3, "c", 3),
    ]), 0)
    v1 = t.current().version
    apply_batch(spark, t, mk([
        row(10, "UPSERT", "c1", 1, "a2", 4),   # update
        row(11, "DELETE", "c2", 2, None, 5),   # delete
        row(12, "INSERT", "c4", 4, "d", 6),    # insert
    ]), 1)

    got = {
        (r["conv_id"], r["turn_idx"]): (r["change_type"], r["text"])
        for r in t.changes(spark, v1).collect()
    }
    # c3 unchanged → absent; delete carries the pre-image
    assert got == {
        ("c1", 1): ("update", "a2"),
        ("c2", 2): ("delete", "b"),
        ("c4", 4): ("insert", "d"),
    }
    # full-span diff from the empty table = all live rows as inserts
    all_ins = t.changes(spark, 0)
    assert {r["change_type"] for r in all_ins.collect()} == {"insert"}
    assert all_ins.count() == 3


def test_changes_across_rename_and_compaction(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)

    def mk(rows):
        return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)

    apply_batch(spark, t, mk([
        (1, datetime(2024, 1, 1, 0, 0, 1), 0, "INSERT", "c1", 1, "user",
         "a", "t0", None, None),
    ]), 0)
    v1 = t.current().version
    apply_batch(spark, t, mk([
        (10, datetime(2024, 1, 1, 0, 0, 2), 0, "RENAME_COLUMN", None, None,
         None, None, None, '{"from":"tool","to":"tool_name"}', None),
        (11, datetime(2024, 1, 1, 0, 0, 3), 0, "UPSERT", "c1", 1, "user",
         "a2", "t1", None, None),
    ]), 1)
    t.compact(spark)  # compaction must be logically invisible to the diff
    ch = t.changes(spark, v1)
    assert "tool_name" in ch.columns  # diff aligns on the NEW names
    r = ch.collect()
    assert len(r) == 1
    assert (r[0]["change_type"], r[0]["text"], r[0]["tool_name"]) == (
        "update", "a2", "t1"
    )
