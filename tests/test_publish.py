"""Debezium-envelope egress (streaming/publish.py): publish a table's
advance as a CDC feed and prove a consumer converges.

Reference analogue: users front the target collection with Kafka
connectors to feed downstream systems (the server/cdc_impl.go:213-320
topology's missing egress half); Debezium JSON lines is the public-
standard envelope this engine already consumes, so publish→consume
composes two tested halves into a full replication loop.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.oracle import replay
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources import generate_changelog
from milvus_cdc_spark.sources.debezium import read_debezium
from milvus_cdc_spark.streaming.publish import publish_round


@pytest.fixture()
def src(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "src"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    return t


def _consume(spark, tmp_path, feed, rounds, n_buckets=4, name="dst"):
    dst = SnapshotTable(str(tmp_path / name))
    dst.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=n_buckets)
    for ep, r in enumerate(rounds):
        batch = read_debezium(
            spark, os.path.join(feed, f"round-{r['to_version']:012d}-*.jsonl")
        )
        apply_batch(spark, dst, batch, epoch=ep)
    return dst


def test_publish_consume_round_trip(spark, tmp_path, src):
    """Bootstrap + incremental rounds (incl. deletes and upserts) through
    the feed reproduce the source's exact final state."""
    log = generate_changelog(spark, 2000, n_parts=4, n_convs=40,
                             turns_per_conv=8, delete_pct=20, upsert_pct=40,
                             evolve=False, drops=False)
    feed = str(tmp_path / "feed")
    apply_batch(spark, src, log.filter(F.col("lsn") < 1000), epoch=0)
    r1 = publish_round(spark, src, feed)
    assert r1["from_version"] is None and r1["published"] > 0
    apply_batch(spark, src, log.filter(F.col("lsn") >= 1000), epoch=1)
    r2 = publish_round(spark, src, feed)
    assert r2["from_version"] == r1["to_version"] and r2["published"] > 0
    dst = _consume(spark, tmp_path, feed, (r1, r2))
    want = sorted(map(tuple, src.read(spark).collect()))
    got = sorted(map(tuple, dst.read(spark).collect()))
    assert got == want and len(got) > 0
    # and the source itself matches the sequential oracle (sanity anchor)
    want_rows, _ = replay([r.asDict() for r in log.collect()])
    assert len(want_rows) == len(got)


def test_publish_two_rounds_in_one_consumer_batch(spark, tmp_path, src):
    """A key's insert envelope (round N) and its tombstone (round N+1)
    batched into ONE consumer trigger must not trip apply_batch's
    duplicate-lsn gate: the tombstone carries the pre-image's lsn offset
    by _DELETE_LSN_OFFSET, so the pair stays distinct. (Regression: the
    tombstone used to reuse the pre-image lsn verbatim, which paused any
    consumer whose trigger spanned both rounds.)"""
    from datetime import datetime

    from milvus_cdc_spark.streaming.cascade import _DELETE_LSN_OFFSET

    ts0 = datetime(2024, 1, 1)
    ins = spark.createDataFrame(
        [(5, ts0, 0, "INSERT", "c1", 1, "user", "keep", None, None, None),
         (6, ts0, 0, "INSERT", "c2", 1, "user", "stay", None, None, None)],
        S.CHANGELOG_SCHEMA,
    )
    dele = spark.createDataFrame(
        [(7, datetime(2024, 1, 2), 0, "DELETE", "c1", 1, None, None, None,
          None, None)],
        S.CHANGELOG_SCHEMA,
    )
    feed = str(tmp_path / "feed")
    apply_batch(spark, src, ins, epoch=0)
    r1 = publish_round(spark, src, feed)
    apply_batch(spark, src, dele, epoch=1)
    r2 = publish_round(spark, src, feed)
    assert r1["published"] == 2 and r2["published"] == 1
    # one batch spanning both rounds — the exact trigger shape a tailing
    # CdcTask produces on catch-up
    both = read_debezium(spark, os.path.join(feed, "*.jsonl"))
    lsns = [r["lsn"] for r in both.select("lsn").collect()]
    assert len(lsns) == len(set(lsns)) == 3
    assert any(l >= _DELETE_LSN_OFFSET for l in lsns)
    dst = SnapshotTable(str(tmp_path / "dst"))
    dst.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    apply_batch(spark, dst, both, epoch=0)  # raised "duplicate lsn" before
    got = sorted(r["conv_id"] for r in dst.read(spark).collect())
    assert got == ["c2"]


def test_publish_noop_at_unadvanced_head(spark, tmp_path, src):
    apply_batch(
        spark, src,
        generate_changelog(spark, 200, evolve=False, drops=False), epoch=0,
    )
    feed = str(tmp_path / "feed")
    r1 = publish_round(spark, src, feed)
    before = sorted(os.listdir(feed))
    r2 = publish_round(spark, src, feed)
    assert r2["published"] == 0 and r2["files"] == []
    assert sorted(os.listdir(feed)) == before
    assert r2["from_version"] == r2["to_version"] == r1["to_version"]


def test_publish_crash_before_cursor_republishes_same_round(spark, tmp_path, src):
    """Files published but cursor lost (crash window): the re-run
    republishes the SAME round under the SAME deterministic names — the
    consumer's epoch gate / last-writer merge dedupes."""
    log = generate_changelog(spark, 600, evolve=False, drops=False,
                             delete_pct=15)
    feed = str(tmp_path / "feed")
    apply_batch(spark, src, log.filter(F.col("lsn") < 300), epoch=0)
    r1 = publish_round(spark, src, feed)
    cursor_after_r1 = open(os.path.join(feed, "_cursor.json")).read()
    apply_batch(spark, src, log.filter(F.col("lsn") >= 300), epoch=1)
    r2 = publish_round(spark, src, feed)
    # the crash window: round files landed but the cursor commit didn't
    with open(os.path.join(feed, "_cursor.json"), "w") as f:
        f.write(cursor_after_r1)
    r3 = publish_round(spark, src, feed)
    assert r3["to_version"] == r2["to_version"]
    assert r3["files"] == r2["files"]  # same deterministic names
    dst = _consume(spark, tmp_path, feed, (r1, r3))
    assert sorted(map(tuple, dst.read(spark).collect())) == sorted(
        map(tuple, src.read(spark).collect())
    )


def test_publish_carries_evolved_columns_in_bag(spark, tmp_path, src):
    """An evolved (ADD_COLUMN) column's values ride the envelope image's
    extra bag; a consumer that applies the same ADD_COLUMN DDL natively
    promotes them — values are not lost to the fixed base image."""
    from datetime import datetime

    ts0 = datetime(2024, 1, 1)
    ddl = spark.createDataFrame(
        [(1, ts0, 0, "ADD_COLUMN", None, None, None, None, None,
          '{"column":"score","type":"int"}', None)],
        S.CHANGELOG_SCHEMA,
    )
    dml = spark.createDataFrame(
        [(2, ts0, 0, "INSERT", "c1", 1, "user", "a", None, None,
          {"score": "7"}),
         (3, ts0, 0, "INSERT", "c2", 2, "user", "b", None, None,
          {"score": "9"})],
        S.CHANGELOG_SCHEMA,
    )
    apply_batch(spark, src, ddl.unionByName(dml), epoch=0)
    feed = str(tmp_path / "feed")
    r1 = publish_round(spark, src, feed)
    dst = SnapshotTable(str(tmp_path / "dst"))
    dst.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    batch = read_debezium(
        spark, os.path.join(feed, f"round-{r1['to_version']:012d}-*.jsonl")
    )
    # consumer applies the same DDL natively (Debezium data streams can't
    # carry DDL; its history topic / the native changelog does)
    apply_batch(spark, dst, ddl.unionByName(batch), epoch=0)
    got = sorted((r["conv_id"], r["score"]) for r in dst.read(spark).collect())
    assert got == [("c1", 7), ("c2", 9)]


def test_publish_task_drains_and_tracks_position(spark, tmp_path, src):
    """PublishTask (streaming/engine.py): availableNow drain publishes up
    to the source's CURRENT version; a later drain after more epochs
    publishes the increment; status reports versions_behind; the registry
    accepts/positions a publish spec Spark-free; the accumulated feed
    replayed round-per-epoch reproduces the source."""
    from milvus_cdc_spark.streaming.engine import PublishTask
    from milvus_cdc_spark.streaming.registry import TaskRegistry

    log = generate_changelog(spark, 1200, n_parts=4, n_convs=24,
                             turns_per_conv=6, delete_pct=15,
                             evolve=False, drops=False)
    apply_batch(spark, src, log.filter(F.col("lsn") < 600), epoch=0)
    feed = str(tmp_path / "feed")
    task = PublishTask(spark, src.root, feed, str(tmp_path / "ckpt"))
    task.start(available_now=True)
    assert task.wait_drained(120)
    st = task.status()
    assert st["versions_behind"] == 0 and st["published_version"] >= 1, st

    apply_batch(spark, src, log.filter(F.col("lsn") >= 600), epoch=1)
    assert task.status()["versions_behind"] > 0
    task.resume(available_now=True)
    assert task.wait_drained(120)
    st2 = task.status()
    assert st2["versions_behind"] == 0
    assert st2["published_version"] > st["published_version"]

    # the feed replays: one epoch per published round
    versions = sorted({
        int(f.split("-")[1]) for f in os.listdir(feed) if f.endswith(".jsonl")
    })
    dst = _consume(
        spark, tmp_path, feed, [{"to_version": v} for v in versions]
    )
    assert sorted(map(tuple, dst.read(spark).collect())) == sorted(
        map(tuple, src.read(spark).collect())
    )

    # registry: publish spec round-trip + Spark-free position
    reg = TaskRegistry(str(tmp_path / "tasks"))
    reg.create("p1", {
        "src_table": src.root, "publish_out": feed,
        "checkpoint": str(tmp_path / "ckpt"),
    })
    pos = reg.position("p1")
    assert pos["published_version"] == st2["published_version"]
    assert pos["versions_behind"] == 0


def test_publish_cli_tables_root_walks_tree(spark, tmp_path):
    """publish --tables-root emits one feed subdirectory per table of a
    multi-collection tree (the reference's one-verb-any-task model)."""
    import io
    from contextlib import redirect_stdout

    from milvus_cdc_spark.streaming.cli import main

    root = tmp_path / "tables"
    for name in ("ta", "tb"):
        t = SnapshotTable(str(root / name))
        t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
        apply_batch(
            spark, t,
            generate_changelog(spark, 120, seed=hash(name) % 1000,
                               evolve=False, drops=False),
            epoch=0,
        )
    feed = str(tmp_path / "feeds")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["publish", "--tables-root", str(root), "--out", feed,
                   "--master", "local[4]"])
    assert rc == 0
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert set(res) == {"ta", "tb"}
    for name in ("ta", "tb"):
        assert res[name]["published"] > 0
        dec = read_debezium(spark, os.path.join(feed, name))
        want = SnapshotTable(str(root / name)).read(spark).count()
        assert dec.count() == want


def test_publish_cli_round_trip(spark, tmp_path):
    """The publish verb end to end from the CLI entry point."""
    from milvus_cdc_spark.streaming.cli import main

    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    apply_batch(
        spark, t,
        generate_changelog(spark, 300, evolve=False, drops=False), epoch=0,
    )
    feed = str(tmp_path / "feed")
    rc = main(["publish", "--table", t.root, "--out", feed,
               "--master", "local[4]"])
    assert rc == 0
    assert os.path.exists(os.path.join(feed, "_cursor.json"))
    names = [f for f in os.listdir(feed) if f.endswith(".jsonl")]
    assert names
    dec = read_debezium(spark, feed)
    assert dec.count() == t.read(spark).count()
    # every decoded row is a well-formed upsert image (changes_to_ops
    # emits OP_UPSERT for non-deletes; 'u' on the wire) with its identity
    assert dec.filter(F.col("op") != "UPSERT").count() == 0
    assert dec.filter(F.col("lsn").isNull()).count() == 0


def test_publish_expired_cursor_fails_loudly(spark, tmp_path, src):
    """A publish cursor below the source's earliest retained version
    cannot advance without silently dropping delete events — the round
    raises a clear error instead of a raw FileNotFoundError (or worse,
    a tombstone-free re-bootstrap leaving consumers with ghost rows).
    Reachable only when the feed's retention pin is gone (operator
    unpinned it, or the feed predates pinning) — publish_round pins its
    base otherwise."""
    from milvus_cdc_spark.streaming.cascade import consumer_pin_name

    feed = str(tmp_path / "feed")
    log = generate_changelog(spark, 400, evolve=False, drops=False)
    apply_batch(spark, src, log.filter(F.col("lsn") < 100), epoch=0)
    publish_round(spark, src, feed)
    assert src.unpin(consumer_pin_name(feed, "publish"))
    for i in range(1, 4):
        apply_batch(
            spark, src,
            log.filter((F.col("lsn") >= i * 100) & (F.col("lsn") < (i + 1) * 100)),
            epoch=i,
        )
    src.vacuum(keep_versions=2, min_age_sec=0)
    with pytest.raises(ValueError, match="expired by vacuum"):
        publish_round(spark, src, feed)


def test_publish_bootstrap_sizes_files_from_rows(spark, tmp_path, src):
    """What's-wrong #3 (round 4): a fixed n_files=1 funnelled a large
    bootstrap through one write task. Default sizing now fans the round
    out by row count — and the multi-file feed still consumes to the
    identical state."""
    log = generate_changelog(spark, 1500, n_parts=4, n_convs=60,
                             turns_per_conv=10, evolve=False, drops=False)
    apply_batch(spark, src, log, epoch=0)
    feed = str(tmp_path / "feed")
    r1 = publish_round(spark, src, feed, target_rows_per_file=100)
    assert r1["published"] > 100
    assert len(r1["files"]) > 1  # bootstrap fans out
    # explicit n_files still pins the layout (small incremental rounds)
    log2 = generate_changelog(spark, 200, n_parts=4, seed=9,
                              evolve=False, drops=False)
    apply_batch(spark, src, log2.withColumn(
        "lsn", F.col("lsn") + 10_000), epoch=1)
    r2 = publish_round(spark, src, feed, n_files=1)
    assert len(r2["files"]) == 1
    dst = _consume(spark, tmp_path, feed, [r1, r2])
    want = sorted(
        tuple(r) for r in src.read(spark)
        .select(*[c for c in dst.read(spark).columns]).collect()
    )
    got = sorted(tuple(r) for r in dst.read(spark).collect())
    assert got == want
