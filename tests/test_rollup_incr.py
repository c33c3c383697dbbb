"""Incremental materialized-view maintenance (operators/rollup.py):
bootstrap + N advance_rollup rounds over changes() diffs must equal the
aggregate recomputed from scratch over the final snapshot, for every
transition shape — post-image updates, inserts into existing and fresh
groups, partial deletes, and whole-group deletions (the group must
vanish from the view). Plus the two scale guards: the refresh scan is
bucket-pruned to the diff's buckets, and the splice joins broadcast the
diff side (the store/snapshot are never shuffled by the maintenance).
"""

import os
from datetime import datetime

from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.operators.rollup import (
    advance_rollup,
    conv_rollup,
    touched_buckets,
)
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources import generate_changelog

N_BUCKETS = 8


def _store_rows(df):
    return sorted(
        (r["conv_id"], r["n_turns"], r["n_chars"], r["transcript_fp"],
         r["last_ts"])
        for r in df.collect()
    )


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    """Three epochs of a generated changelog (deletes, upserts, ties,
    DDL interleave) maintained incrementally — every round's spliced
    view must equal conv_rollup over the table as it stands."""
    log = generate_changelog(
        spark, 4000, n_parts=4, n_convs=30, turns_per_conv=6
    )
    hi = log.agg(F.max("lsn")).collect()[0][0]
    step = hi // 3 + 1
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=N_BUCKETS, overwrite=True)
    apply_batch(spark, t, log.filter(F.col("lsn") < step), epoch=0)
    store = conv_rollup(t.read(spark))
    for i in (1, 2):
        v_prev = t.current().version
        apply_batch(
            spark,
            t,
            log.filter(
                (F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step)
            ),
            epoch=i,
        )
        diff = t.changes(spark, v_prev)
        snap = t.read(spark, buckets=touched_buckets(diff, N_BUCKETS))
        store = advance_rollup(
            store, snap, diff, ["conv_id"], conv_rollup
        ).localCheckpoint()
        assert _store_rows(store) == _store_rows(conv_rollup(t.read(spark))), (
            f"round {i} diverged from full recompute"
        )


def test_whole_group_deletion_drops_view_row(spark, tmp_path):
    """A conversation whose every turn is deleted must leave the view."""
    ts = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, ts(0), 0, "INSERT", "ca", 0, "user", "x", None, None, None),
        (2, ts(1), 0, "INSERT", "ca", 1, "user", "y", None, None, None),
        (3, ts(2), 0, "INSERT", "cb", 0, "user", "z", None, None, None),
    ]
    mk = lambda rs: spark.createDataFrame(rs, S.CHANGELOG_SCHEMA)  # noqa: E731
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=N_BUCKETS, overwrite=True)
    apply_batch(spark, t, mk(rows), epoch=0)
    store = conv_rollup(t.read(spark))
    assert {r["conv_id"] for r in store.collect()} == {"ca", "cb"}

    v = t.current().version
    dels = [
        (4, ts(3), 0, "DELETE", "ca", 0, None, None, None, None, None),
        (5, ts(4), 0, "DELETE", "ca", 1, None, None, None, None, None),
    ]
    apply_batch(spark, t, mk(dels), epoch=1)
    diff = t.changes(spark, v)
    snap = t.read(spark, buckets=touched_buckets(diff, N_BUCKETS))
    store = advance_rollup(store, snap, diff, ["conv_id"], conv_rollup)
    got = {r["conv_id"] for r in store.collect()}
    assert got == {"cb"}, got
    assert _store_rows(store) == _store_rows(conv_rollup(t.read(spark)))


def test_refresh_scan_is_bucket_pruned_and_joins_broadcast(spark, tmp_path):
    """Scale guards: a diff touching one conversation must (a) read only
    that conversation's bucket in the refresh scan, and (b) splice via
    broadcast joins — no shuffle of the store or snapshot."""
    log = generate_changelog(
        spark, 3000, n_parts=4, n_convs=30, turns_per_conv=6,
        evolve=False, drops=False,
    )
    hi = log.agg(F.max("lsn")).collect()[0][0]
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=N_BUCKETS, overwrite=True)
    apply_batch(spark, t, log, epoch=0)
    store = conv_rollup(t.read(spark)).localCheckpoint()

    one = t.read(spark).limit(1).collect()[0]
    v = t.current().version
    upd = spark.createDataFrame(
        [(hi + 10, one["ts"], one["part"], "UPSERT", one["conv_id"],
          one["turn_idx"], "user", "fresh-text", None, None, None)],
        S.CHANGELOG_SCHEMA,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    apply_batch(spark, t, upd, epoch=1)
    diff = t.changes(spark, v).localCheckpoint()

    bks = touched_buckets(diff, N_BUCKETS)
    assert len(bks) == 1, bks
    snap = t.read(spark, buckets=bks)
    scanned = {os.path.basename(os.path.dirname(f)) for f in snap.inputFiles()}
    assert scanned == {f"bucket={bks[0]}"}, scanned

    spliced = advance_rollup(store, snap, diff, ["conv_id"], conv_rollup)
    plan = spliced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "store/snapshot shuffled by splice"
    assert "CartesianProduct" not in plan
    assert _store_rows(spliced) == _store_rows(conv_rollup(t.read(spark)))


def test_rollup_cli_round_trip(spark, tmp_path):
    """The `rollup` CLI verb: bootstrap round → no-op round (cursor at
    head) → incremental round after more epochs; the persisted view must
    equal conv_rollup over the final table."""
    import json
    import subprocess
    import sys

    log = generate_changelog(
        spark, 2500, n_parts=4, n_convs=25, turns_per_conv=6
    )
    hi = log.agg(F.max("lsn")).collect()[0][0]
    mid = hi // 2
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=N_BUCKETS, overwrite=True)
    apply_batch(spark, t, log.filter(F.col("lsn") <= mid), epoch=0)

    store = str(tmp_path / "view_store")
    env = {**os.environ, "PYTHONPATH": "/root/repo"}

    def cli(*args):
        r = subprocess.run(
            [sys.executable, "-m", "milvus_cdc_spark.streaming.cli", *args],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    r1 = cli("rollup", "--table", t.root, "--store", store,
             "--master", "local[2]")
    assert not r1["skipped"] and r1["n_groups"] > 0

    r2 = cli("rollup", "--table", t.root, "--store", store,
             "--master", "local[2]")
    assert r2["skipped"] and r2["version"] == r1["version"]

    apply_batch(spark, t, log.filter(F.col("lsn") > mid), epoch=1)
    r3 = cli("rollup", "--table", t.root, "--store", store,
             "--master", "local[2]")
    assert not r3["skipped"] and r3["version"] > r1["version"]

    view = spark.read.parquet(os.path.join(r3["store"], "view"))
    assert _store_rows(view) == _store_rows(conv_rollup(t.read(spark)))


def test_view_task_drains_and_tracks_position(spark, tmp_path):
    """ViewTask (streaming/engine.py): availableNow drain catches the
    view up to the source's CURRENT version; a later drain after more
    epochs advances it again; status reports versions_behind; the
    registry accepts/positions a view spec Spark-free."""
    from milvus_cdc_spark.streaming.engine import ViewTask
    from milvus_cdc_spark.streaming.registry import TaskRegistry

    log = generate_changelog(
        spark, 2400, n_parts=4, n_convs=24, turns_per_conv=6
    )
    hi = log.agg(F.max("lsn")).collect()[0][0]
    mid = hi // 2
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=N_BUCKETS, overwrite=True)
    apply_batch(spark, t, log.filter(F.col("lsn") <= mid), epoch=0)

    store = str(tmp_path / "view_store")
    task = ViewTask(spark, t.root, store, str(tmp_path / "ckpt"))
    task.start(available_now=True)
    assert task.wait_drained(120)
    st = task.status()
    assert st["versions_behind"] == 0 and st["view_version"] >= 1, st
    view = spark.read.parquet(os.path.join(store, f"v{st['view_version']}", "view"))
    assert _store_rows(view) == _store_rows(conv_rollup(t.read(spark)))

    apply_batch(spark, t, log.filter(F.col("lsn") > mid), epoch=1)
    assert task.status()["versions_behind"] > 0
    task.resume(available_now=True)
    assert task.wait_drained(120)
    st2 = task.status()
    assert st2["versions_behind"] == 0 and st2["view_version"] > st["view_version"]
    view2 = spark.read.parquet(
        os.path.join(store, f"v{st2['view_version']}", "view")
    )
    assert _store_rows(view2) == _store_rows(conv_rollup(t.read(spark)))

    # registry: view spec round-trip + Spark-free position
    reg = TaskRegistry(str(tmp_path / "tasks"))
    reg.create("v1", {
        "src_table": t.root, "view_store": store,
        "checkpoint": str(tmp_path / "ckpt"),
    })
    pos = reg.position("v1")
    assert pos["view_version"] == st2["view_version"]
    assert pos["versions_behind"] == 0
