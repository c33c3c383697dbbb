"""TRUNCATE (DropCollection analogue) semantics: table-level watermark
kills strictly-older rows, converges under any batch ordering, survives
compaction, and defeats late-arriving DML older than the truncate.

Reference: DropCollection is one of the four whitelisted replicate message
types (core/reader/replicate_channel_manager.go:1162-1167); writer path
core/writer/channel_writer.go:430-465; e2e shape
tests/testcases/test_cdc_sync_requests.py:66-107.
"""

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.oracle import replay
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources import generate_changelog, write_changelog, read_changelog

N = 3000


@pytest.fixture(scope="module")
def changelog(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tlog") / "events")
    df = generate_changelog(
        spark, N, n_parts=4, n_convs=40, turns_per_conv=20,
        truncates=True, num_partitions=8,
    )
    write_changelog(df, path, n_files=8)
    return path


@pytest.fixture(scope="module")
def oracle_result(spark, changelog):
    rows = [r.asDict() for r in read_changelog(spark, changelog).collect()]
    return replay(rows)


def _rows(spark, table):
    df = table.read(spark)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _oracle_rows(oracle_result):
    rows, cols = oracle_result
    scols = sorted(cols)
    return sorted(tuple(r[c] for c in scols) for r in rows)


def _apply(spark, root, changelog, order):
    table = SnapshotTable(root)
    table.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=8, overwrite=True)
    log = read_changelog(spark, changelog)
    step = N // len(order)
    for epoch, i in enumerate(order):
        hi = (i + 1) * step if i < len(order) - 1 else N
        batch = log.filter((F.col("lsn") >= i * step) & (F.col("lsn") < hi))
        apply_batch(spark, table, batch, epoch=epoch)
    return table


def test_truncate_matches_oracle_in_order(spark, changelog, oracle_result, tmp_path):
    table = _apply(spark, str(tmp_path / "t"), changelog, [0, 1, 2, 3])
    m = table.current()
    assert m.truncate_watermark, "generator emitted a TRUNCATE"
    assert _rows(spark, table) == _oracle_rows(oracle_result)
    # no surviving row predates the truncate watermark
    assert (
        table.read(spark)
        .filter(F.col("ts") < F.lit(m.truncate_watermark).cast("timestamp"))
        .count()
        == 0
    )


def test_truncate_out_of_order_converges(spark, changelog, oracle_result, tmp_path):
    """Late batches carrying DML OLDER than an already-applied TRUNCATE
    must lose — the truncate lands in epoch 0 here, older slices after."""
    table = _apply(spark, str(tmp_path / "ooo"), changelog, [3, 1, 4, 0, 2])
    assert _rows(spark, table) == _oracle_rows(oracle_result)


def test_recreate_with_new_schema_mid_log(spark, tmp_path):
    """Collection re-creation with a NEW schema mid-log (reference
    collection_reader.go:200-227): expressed as TRUNCATE followed by
    ADD_COLUMN + fresh data — old rows gone, new rows carry the evolved
    column, late pre-recreate DML still loses."""
    import datetime as dt

    from milvus_cdc_spark.schemas import CHANGELOG_SCHEMA

    t0 = dt.datetime(2024, 1, 1)

    def ev(lsn, sec, op, conv=None, turn=None, text=None, ddl=None, extra=None):
        return (
            lsn, t0 + dt.timedelta(seconds=sec), 0, op, conv, turn,
            "user" if conv else None, text, None, ddl, extra,
        )

    gen1 = [ev(i, i, "INSERT", f"c{i % 3}", i % 2, f"old{i}") for i in range(6)]
    recreate = [
        ev(6, 10, "TRUNCATE", ddl="{}"),
        ev(7, 11, "ADD_COLUMN", ddl='{"column":"score","type":"int"}'),
    ]
    gen2 = [
        ev(8 + i, 12 + i, "INSERT", f"c{i % 3}", i % 2, f"new{i}",
           extra={"score": str(100 + i)})
        for i in range(4)
    ]
    late_old = [ev(20, 5, "INSERT", "c9", 0, "stale")]  # ts predates TRUNCATE

    table = SnapshotTable(str(tmp_path / "re"))
    table.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, overwrite=True)
    for epoch, rows in enumerate([gen1, recreate, gen2, late_old]):
        apply_batch(
            spark, table, spark.createDataFrame(rows, CHANGELOG_SCHEMA), epoch=epoch
        )
    df = table.read(spark)
    assert "score" in df.columns  # new-generation schema visible
    texts = {r["text"] for r in df.collect()}
    assert texts == {f"new{i}" for i in range(4)}  # old + stale rows gone
    assert {r["score"] for r in df.collect()} == {100, 101, 102, 103}


def test_truncate_survives_compact(spark, changelog, oracle_result, tmp_path):
    """Compaction physically removes truncated rows but RETAINS the
    watermark, so late DML older than the truncate still loses."""
    table = SnapshotTable(str(tmp_path / "c"))
    table.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=8, overwrite=True)
    log = read_changelog(spark, changelog)
    cut = (N * 40) // 100  # generator places TRUNCATE at this lsn
    apply_batch(spark, table, log.filter(F.col("lsn") >= cut), epoch=0)
    m = table.current()
    assert m.truncate_watermark
    table.compact(spark)
    assert table.current().truncate_watermark == m.truncate_watermark
    # now the stale pre-truncate slice arrives late
    apply_batch(spark, table, log.filter(F.col("lsn") < cut), epoch=1)
    assert _rows(spark, table) == _oracle_rows(oracle_result)
