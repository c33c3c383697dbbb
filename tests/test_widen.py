"""WIDEN_COLUMN (Iceberg-spec type promotion) semantics: metadata-only
int→bigint / float→double evolution, old narrow parquet files upcast at
scan time, converges under any batch ordering (widen-before-add lands in
``pending_widens``), invalid promotions are documented no-ops, and the
promoted type survives compaction.

Reference analogue: schema changes ride the same replicated op channel as
the rest of the DDL (core/reader/etcd_op.go:609-660); the promotion rules
themselves are the Iceberg format spec's "Schema Evolution" lattice.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.oracle import replay
from milvus_cdc_spark.plans.manifest import SnapshotTable, is_widening
from milvus_cdc_spark.sources import (
    generate_changelog,
    read_changelog,
    write_changelog,
)

N = 2000


def _row(lsn, op, conv=None, turn=None, text=None, ddl=None, extra=None, sec=0):
    role = "user" if op in (S.OP_INSERT, S.OP_UPSERT) else None
    return (
        lsn, datetime(2024, 1, 1, 0, 0, sec), 0, op, conv, turn, role,
        text, None, ddl, extra,
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)


def _types(table):
    return {c: t for c, t in table.current().columns}


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    return t


def test_lattice():
    assert is_widening("int", "bigint")
    assert is_widening("float", "double")
    assert not is_widening("bigint", "int")  # narrowing
    assert not is_widening("int", "double")  # cross-family (Iceberg rule)
    assert not is_widening("string", "bigint")
    assert not is_widening("int", "int")  # promotion must move


def test_widen_base_column_upcasts_old_files(spark, table):
    apply_batch(
        spark, table,
        _mk(spark, [_row(1, "INSERT", "c1", 1, "a", sec=1),
                    _row(2, "INSERT", "c2", 2, "b", sec=2)]),
        0,
    )
    apply_batch(
        spark, table,
        _mk(spark, [_row(10, "WIDEN_COLUMN",
                         ddl='{"column":"turn_idx","type":"bigint"}', sec=3)]),
        1,
    )
    assert _types(table)["turn_idx"] == "bigint"
    df = table.read(spark)
    assert dict(df.dtypes)["turn_idx"] == "bigint"
    # epoch-0 files were written int32 and must upcast at scan time
    assert sorted(r["turn_idx"] for r in df.collect()) == [1, 2]


def test_widen_added_column_and_invalid_requests(spark, table):
    apply_batch(
        spark, table,
        _mk(spark, [
            _row(1, "ADD_COLUMN", ddl='{"column":"score","type":"int"}', sec=1),
            _row(2, "WIDEN_COLUMN", ddl='{"column":"score","type":"bigint"}', sec=1),
            _row(3, "WIDEN_COLUMN", ddl='{"column":"text","type":"bigint"}', sec=1),
            _row(4, "WIDEN_COLUMN", ddl='{"column":"part","type":"int"}', sec=1),
        ]),
        0,
    )
    apply_batch(
        spark, table,
        _mk(spark, [_row(10, "INSERT", "c1", 1, "x",
                         extra={"score": "7"}, sec=2)]),
        1,
    )
    tys = _types(table)
    assert tys["score"] == "bigint"
    assert tys["text"] == "string"  # cross-family widen ignored
    assert tys["part"] == "int"  # self-widen ignored
    got = table.read(spark).select("conv_id", "score").collect()
    assert [(r["conv_id"], r["score"]) for r in got] == [("c1", 7)]


def test_widen_before_add_stays_pending_then_applies(spark, table):
    # out-of-order batching: the WIDEN lands in an EARLIER epoch than the
    # ADD_COLUMN it refers to — it must wait in the manifest, not be lost
    apply_batch(
        spark, table,
        _mk(spark, [_row(20, "WIDEN_COLUMN",
                         ddl='{"column":"score","type":"bigint"}', sec=5)]),
        0,
    )
    assert table.current().pending_widens == {"score": "bigint"}
    apply_batch(
        spark, table,
        _mk(spark, [_row(1, "ADD_COLUMN",
                         ddl='{"column":"score","type":"int"}', sec=1)]),
        1,
    )
    assert _types(table)["score"] == "bigint"
    assert table.current().pending_widens == {}


def test_widen_epoch_replay_is_idempotent(spark, table):
    batch = _mk(spark, [
        _row(1, "INSERT", "c1", 1, "a", sec=1),
        _row(2, "WIDEN_COLUMN", ddl='{"column":"turn_idx","type":"bigint"}', sec=2),
    ])
    apply_batch(spark, table, batch, 0)
    v = table.current().version
    assert apply_batch(spark, table, batch, 0)["skipped"]
    assert table.current().version == v
    assert _types(table)["turn_idx"] == "bigint"


def test_widen_survives_compaction(spark, table):
    apply_batch(
        spark, table,
        _mk(spark, [_row(1, "INSERT", "c1", 1, "a", sec=1)]),
        0,
    )
    apply_batch(
        spark, table,
        _mk(spark, [
            _row(10, "WIDEN_COLUMN", ddl='{"column":"turn_idx","type":"bigint"}', sec=2),
            _row(11, "WIDEN_COLUMN", ddl='{"column":"ghost","type":"bigint"}', sec=2),
        ]),
        1,
    )
    table.compact(spark)
    assert _types(table)["turn_idx"] == "bigint"
    assert table.current().pending_widens == {"ghost": "bigint"}
    assert [r["turn_idx"] for r in table.read(spark).collect()] == [1]


def test_generated_log_with_widen_matches_oracle(spark, tmp_path):
    # engine-level: a generator log carrying an interleaved WIDEN_COLUMN
    # replayed in three arbitrary-order epochs converges to the sequential
    # oracle, with the widened type on the final schema
    path = str(tmp_path / "wlog")
    df = generate_changelog(
        spark, N, n_parts=4, n_convs=40, turns_per_conv=20,
        widens=True, num_partitions=8,
    )
    write_changelog(df, path, n_files=6)
    log = read_changelog(spark, path)
    expected_rows, _cols = replay([r.asDict() for r in log.collect()])

    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    step = N // 3 + 1
    for i in (2, 0, 1):  # deliberately out of order
        batch = log.filter(
            (F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step)
        )
        apply_batch(spark, t, batch, epoch=i)
    assert _types(t)["turn_idx"] == "bigint"
    got = t.read(spark)
    cols = sorted(got.columns)
    got_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    exp_rows = sorted(tuple(r[c] for c in cols) for r in expected_rows)
    assert got_rows == exp_rows
