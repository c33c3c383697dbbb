"""Compaction + vacuum (Iceberg rewrite_data_files / expire_snapshots
analogues): logical table state must be invariant under both, dead files
must actually disappear, and merge-on-read drop watermarks must be
physically applied by compaction."""

import os

from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources import generate_changelog


def _build(spark, tmp_path, epochs=4, n=8000):
    log = generate_changelog(spark, n, n_parts=4, n_convs=40, turns_per_conv=8)
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=8, overwrite=True)
    step = n // epochs
    for e in range(epochs):
        apply_batch(
            spark, t,
            log.filter((F.col("lsn") >= e * step) & (F.col("lsn") < (e + 1) * step)),
            epoch=e,
        )
    return t


def _state(spark, t):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read(spark).collect()
    )


def _n_parquet(root):
    return sum(
        1 for dp, _d, fs in os.walk(root) for f in fs if f.endswith(".parquet")
    )


def test_compact_preserves_state_and_retains_watermarks(spark, tmp_path):
    t = _build(spark, tmp_path)
    before = _state(spark, t)
    m0 = t.current()
    assert m0.drop_watermarks, "fixture should include a DROP_PARTITION"
    m1 = t.compact(spark)
    assert m1.version == m0.version + 1
    # watermarks RETAINED: stored rows are physically clean, but late DML
    # older than a drop must still lose in future applies
    assert m1.drop_watermarks == m0.drop_watermarks
    assert t.compact(spark, clear_drop_watermarks=True).drop_watermarks == {}
    assert _state(spark, t) == before
    # one file per occupied bucket
    assert all(len(v) == 1 for v in m1.files.values())


def test_compact_drop_tombstones_keeps_logical_view(spark, tmp_path):
    t = _build(spark, tmp_path)
    before = _state(spark, t)
    t.compact(spark, drop_tombstones=True)
    assert _state(spark, t) == before
    phys = t.read(spark, logical=False)
    assert phys.filter(~F.coalesce(F.col("alive"), F.lit(True))).count() == 0


def test_vacuum_removes_dead_files_only(spark, tmp_path):
    t = _build(spark, tmp_path)
    before = _state(spark, t)
    t.compact(spark)
    n_before = _n_parquet(t.root)
    res = t.vacuum(keep_versions=1, min_age_sec=0)
    assert res["deleted_files"] > 0
    assert _n_parquet(t.root) < n_before
    assert _state(spark, t) == before, "live snapshot untouched by vacuum"
    # expired manifests are gone, CURRENT still resolves
    assert t.current().version >= 1


def test_apply_continues_after_maintenance(spark, tmp_path):
    n = 8000
    log = generate_changelog(spark, n, n_parts=4, n_convs=40, turns_per_conv=8)
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=8, overwrite=True)
    apply_batch(spark, t, log.filter(F.col("lsn") < n // 2), epoch=0)
    t.compact(spark)
    t.vacuum(keep_versions=1, min_age_sec=0)
    apply_batch(spark, t, log.filter(F.col("lsn") >= n // 2), epoch=1)

    # reference: the same log applied in one shot without maintenance
    t2 = SnapshotTable(str(tmp_path / "t2"))
    t2.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=8, overwrite=True)
    apply_batch(spark, t2, log, epoch=0)
    assert _state(spark, t) == _state(spark, t2)


def test_crash_replay_between_write_and_commit(spark, tmp_path):
    """foreachBatch replay window (SURVEY §7.4): a crash AFTER the epoch's
    data files are written but BEFORE the manifest commit must be healed
    by re-running the same batch — same final state, no duplicate rows."""
    n = 8000
    log = generate_changelog(spark, n, n_parts=4, n_convs=40, turns_per_conv=8)
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=8, overwrite=True)
    apply_batch(spark, t, log.filter(F.col("lsn") < n // 2), epoch=0)
    v_before = t.current().version

    apply_batch(spark, t, log.filter(F.col("lsn") >= n // 2), epoch=1)
    reference = _state(spark, t)

    # simulate the crash: epoch-1 data files exist on disk, but CURRENT
    # still points at the pre-epoch-1 manifest
    cur = os.path.join(t.meta_dir, "CURRENT")
    with open(cur, "w") as f:
        f.write(str(v_before))
    assert not t.committed_epoch(1)

    # streaming recovery re-runs the same batch under the same epoch id
    apply_batch(spark, t, log.filter(F.col("lsn") >= n // 2), epoch=1)
    assert t.committed_epoch(1)
    assert _state(spark, t) == reference


def test_late_dml_after_compact_still_loses_to_drop(spark, tmp_path):
    """Regression: compact() must not clear drop watermarks by default —
    a late INSERT older than an applied DROP_PARTITION would otherwise be
    resurrected, diverging from the sequential oracle."""
    import json as _json

    t = _build(spark, tmp_path)
    m = t.current()
    assert m.drop_watermarks
    part, wm_ts = next(iter(m.drop_watermarks.items()))
    before = _state(spark, t)
    t.compact(spark)

    # craft a late event strictly older than the drop watermark, in the
    # dropped partition
    late = spark.createDataFrame(
        [(10_000_000, "late_conv", 0, int(part), "user", "resurrected?", None)],
        "lsn long, conv_id string, turn_idx int, part int, role string, text string, tool string",
    ).select(
        "lsn",
        F.expr(f"timestamp '{wm_ts}' - interval 1 hour").alias("ts"),
        "part",
        F.lit("INSERT").alias("op"),
        "conv_id", "turn_idx", "role", "text", "tool",
        F.lit(None).cast("string").alias("ddl_arg"),
        F.lit(None).cast("map<string,string>").alias("extra"),
    )
    apply_batch(spark, t, late, epoch=77)
    assert _state(spark, t) == before, "late pre-drop DML was resurrected"


def test_vacuum_age_guard_protects_uncommitted_files(spark, tmp_path):
    """Files younger than min_age_sec are never deleted — they may belong
    to an epoch in the write-then-commit window."""
    t = _build(spark, tmp_path)
    t.compact(spark)
    n_before = _n_parquet(t.root)
    res = t.vacuum(keep_versions=1)  # default min_age: everything is young
    assert res["deleted_files"] == 0
    assert _n_parquet(t.root) == n_before
