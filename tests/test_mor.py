"""Merge-on-read write mode (``write_mode="mor"`` — Iceberg v2 MOR
analogue): epochs APPEND deduped delta files (write cost O(batch),
independent of table size), reads resolve last-writer per key with the
same (ts, rank, lsn) total order the CoW merge uses, and compaction folds
deltas back to one file per bucket.

The CoW motivation is measured in BASELINE.md: at 200M events / 9 epochs
the CoW drain decays to 489k ev/s because uniformly-hashed keys make
every epoch rewrite the whole accumulated table.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
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
    path = str(tmp_path_factory.mktemp("morlog") / "events")
    df = generate_changelog(
        spark, N, n_parts=4, n_convs=40, turns_per_conv=20,
        truncates=True, widens=True, num_partitions=8,
    )
    write_changelog(df, path, n_files=6)
    return path


@pytest.fixture(scope="module")
def expected(spark, changelog):
    log = read_changelog(spark, changelog)
    rows, _ = replay([r.asDict() for r in log.collect()])
    return rows


def _state(spark, table):
    df = table.read(spark)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect()), cols


def _apply_slices(spark, table, log, order):
    step = N // len(order) + 1
    for i in order:
        batch = log.filter(
            (F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step)
        )
        apply_batch(spark, table, batch, epoch=i)


def test_mor_out_of_order_converges_with_ddl(spark, changelog, expected, tmp_path):
    # the full gauntlet in one log: TRUNCATE watermark, ADD/RENAME/WIDEN
    # DDL, drop-partition — applied as appended deltas in shuffled epoch
    # order, resolved at read
    log = read_changelog(spark, changelog)
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode="mor")
    _apply_slices(spark, t, log, (3, 1, 0, 2))
    got, cols = _state(spark, t)
    exp = sorted(tuple(r[c] for c in cols) for r in expected)
    assert got == exp
    # deltas really did append: multiple files per bucket, no rewrite
    assert any(len(v) > 1 for v in t.current().files.values())
    # replayed epoch is a no-op
    assert apply_batch(
        spark, t, log.filter(F.col("lsn") < 10), epoch=0
    )["skipped"]


def test_mor_compaction_folds_and_apply_continues(spark, changelog, expected, tmp_path):
    log = read_changelog(spark, changelog)
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode="mor")
    _apply_slices(spark, t, log, (0, 1, 2, 3))
    t.compact(spark)
    m = t.current()
    assert m.write_mode == "mor"
    assert all(len(v) == 1 for v in m.files.values())
    got, cols = _state(spark, t)
    exp = sorted(tuple(r[c] for c in cols) for r in expected)
    assert got == exp
    # post-compact epochs append fresh deltas and resolve against the
    # folded base
    late = spark.createDataFrame(
        [(N + 10, datetime(2026, 1, 1), 0, S.OP_UPSERT, "conv_1", 1,
          "user", "post-compact", None, None, None)],
        S.CHANGELOG_SCHEMA,
    )
    apply_batch(spark, t, late, epoch=99)
    rows = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in t.read(spark).collect()}
    assert rows[("conv_1", 1)] == "post-compact"


def test_mor_tombstone_defeats_late_older_insert(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode="mor")

    def row(lsn, op, text, sec):
        role = "user" if op != S.OP_DELETE else None
        return (lsn, datetime(2024, 1, 1, 0, 0, sec), 0, op, "c1", 1,
                role, text, None, None, None)

    mk = lambda rows: spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)
    # newer DELETE lands first (epoch 0); older INSERT arrives late
    apply_batch(spark, t, mk([row(10, "DELETE", None, 5)]), 0)
    apply_batch(spark, t, mk([row(1, "INSERT", "stale", 1)]), 1)
    assert t.read(spark).count() == 0  # tombstone wins at resolution
    # then an even newer INSERT resurrects the key
    apply_batch(spark, t, mk([row(20, "INSERT", "fresh", 9)]), 2)
    assert [r["text"] for r in t.read(spark).collect()] == ["fresh"]


def test_mor_changes_diff_works(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode="mor")

    def row(lsn, op, conv, text, sec):
        return (lsn, datetime(2024, 1, 1, 0, 0, sec), 0, op, conv, 1,
                "user", text, None, None, None)

    mk = lambda rows: spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)
    apply_batch(spark, t, mk([row(1, "INSERT", "c1", "a", 1),
                              row(2, "INSERT", "c2", "b", 2)]), 0)
    v1 = t.current().version
    apply_batch(spark, t, mk([row(10, "UPSERT", "c1", "a2", 3)]), 1)
    got = {(r["conv_id"], r["change_type"], r["text"])
           for r in t.changes(spark, v1).collect()}
    assert got == {("c1", "update", "a2")}


def test_mor_single_file_fast_path_skips_resolution(spark, tmp_path):
    # one epoch → one delta file per bucket → the read plan must NOT
    # contain the resolution aggregate/join
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2, write_mode="mor")
    apply_batch(spark, t, spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 0, "INSERT", "c1", 1, "user", "a",
          None, None, None)],
        S.CHANGELOG_SCHEMA,
    ), 0)
    assert all(len(v) == 1 for v in t.current().files.values())
    plan = t.read(spark)._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan and "Join" not in plan


def test_mor_auto_compact_during_drain(spark, changelog, expected, tmp_path):
    # streaming drain with auto_compact_files=2: the task folds over-
    # threshold buckets on a BACKGROUND worker (per-bucket compact_buckets
    # — the epoch loop never stalls behind a rewrite); epoch commits
    # rebase their appends over the concurrent fold commits, the drain's
    # clean stop joins the in-flight fold, and the final state still
    # matches the sequential oracle
    from milvus_cdc_spark.streaming.engine import run_until_drained

    task = run_until_drained(
        spark,
        changelog,
        str(tmp_path / "transcripts"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # one epoch per log file → 6 epochs
        n_buckets=4,
        write_mode="mor",
        auto_compact_files=2,
    )
    m = task.table.current()
    assert m.write_mode == "mor"
    # a fold really committed (manifest records it), no fold errored, and
    # folding genuinely bounded the chains below the no-fold fill (every
    # epoch touches every bucket here, so 6 epochs with no fold would
    # leave ≥6 files in each bucket)
    assert "last_fold_version" in m.summary
    assert not task.status().get("fold_errors")
    assert task._fold_futures == {}
    assert any(len(v) < 6 for v in m.files.values()), {
        k: len(v) for k, v in m.files.items()
    }
    got, cols = _state(spark, task.table)
    exp = sorted(tuple(r[c] for c in cols) for r in expected)
    assert got == exp


def test_mor_vacuum_gcs_folded_deltas(spark, tmp_path):
    # after compaction, the pre-fold delta files are unreferenced by the
    # current manifest; vacuum (expire_snapshots) must physically remove
    # them while the logical state stays intact
    import os

    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2, write_mode="mor")

    def row(lsn, text, sec):
        return (lsn, datetime(2024, 1, 1, 0, 0, sec), 0, "UPSERT", "c1", 1,
                "user", text, None, None, None)

    for e in range(3):
        apply_batch(spark, t, spark.createDataFrame(
            [row(e * 10 + 1, f"v{e}", e)], S.CHANGELOG_SCHEMA), e)
    t.compact(spark)
    n_before = sum(
        len(fs) for _, _, fs in os.walk(os.path.join(t.root, "data"))
    )
    stats = t.vacuum(keep_versions=1, min_age_sec=0.0)
    n_after = sum(
        len(fs) for _, _, fs in os.walk(os.path.join(t.root, "data"))
    )
    assert stats["deleted_files"] > 0
    assert n_after < n_before
    rows = t.read(spark).collect()
    assert [(r["conv_id"], r["text"]) for r in rows] == [("c1", "v2")]
