"""Consumer version pins: retention coordination between a table's
vacuum and its incremental consumers (publish feeds, cascade replicas).

Reference analogue: task replay positions live in etcd and gate what the
source MQ may drop (server/cdc_impl.go); Iceberg's analogue is branch/
tag retention refs. Here a consumer pins the version it will next diff
FROM, and vacuum never expires manifests at or above the lowest pin —
making the expired-base errors (publish_round / cascade_until_current)
unreachable in the steady cadence.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources import generate_changelog
from milvus_cdc_spark.streaming.cascade import (
    cascade_until_current,
    consumer_pin_name,
    create_target_like,
)
from milvus_cdc_spark.streaming.publish import publish_round


def _grow(spark, t, lo, hi, epoch, log=None):
    log = log if log is not None else generate_changelog(
        spark, hi, evolve=False, drops=False, delete_pct=10
    )
    apply_batch(
        spark, t, log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
        epoch=epoch,
    )
    return log


def test_pin_floors_vacuum_and_unpin_releases(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    log = generate_changelog(spark, 500, evolve=False, drops=False)
    for i in range(5):
        _grow(spark, t, i * 100, (i + 1) * 100, i, log)
    t.pin_version("feed-a", 2)
    res = t.vacuum(keep_versions=1, min_age_sec=0)
    assert res["pin_floor"] == 2
    # v2..cur retained despite keep_versions=1; v0/v1 expired
    assert t.earliest_retained_version() == 2
    t.at_version(2)  # usable diff base
    assert t.pins() == {"feed-a": 2}
    # advancing the pin then vacuuming releases the older manifests
    t.pin_version("feed-a", 4)
    t.vacuum(keep_versions=1, min_age_sec=0)
    assert t.earliest_retained_version() == 4
    assert t.unpin("feed-a") is True and t.unpin("feed-a") is False
    t.vacuum(keep_versions=1, min_age_sec=0)
    assert t.earliest_retained_version() == t.current().version
    assert "pins" in t.stats() and t.stats()["pins"] == {}


def test_pin_name_validation(tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2)
    for bad in ("", "a/b", "a b", "../x"):
        with pytest.raises(ValueError, match="pin name"):
            t.pin_version(bad, 1)


def test_publish_round_pins_its_base(spark, tmp_path):
    """The steady publish→vacuum cadence never hits the expired-cursor
    error: each round pins the version the next round diffs from."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    feed = str(tmp_path / "feed")
    log = generate_changelog(spark, 400, evolve=False, drops=False,
                             delete_pct=15)
    _grow(spark, t, 0, 100, 0, log)
    r1 = publish_round(spark, t, feed)
    assert t.pins() == {consumer_pin_name(feed, "publish"): r1["to_version"]}
    for i in range(1, 4):
        _grow(spark, t, i * 100, (i + 1) * 100, i, log)
        t.vacuum(keep_versions=1, min_age_sec=0)  # pin keeps the base
        r = publish_round(spark, t, feed)
        assert r["published"] >= 0 and r["from_version"] is not None
    assert t.pins()[consumer_pin_name(feed, "publish")] == t.current().version


def test_cascade_pins_source_and_delete_unpins(spark, tmp_path):
    src = SnapshotTable(str(tmp_path / "src"))
    src.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    log = generate_changelog(spark, 300, evolve=False, drops=False)
    _grow(spark, src, 0, 150, 0, log)
    dst = SnapshotTable(str(tmp_path / "dst"))
    create_target_like(src, dst)
    cascade_until_current(spark, src, dst, 0)
    pin = consumer_pin_name(dst.root, "cascade")
    assert src.pins()[pin] == src.current().version
    # source advances + aggressive vacuum: the pinned base survives and
    # the next hop stays INCREMENTAL (no snapshot re-bootstrap)
    _grow(spark, src, 150, 300, 1, log)
    src.vacuum(keep_versions=1, min_age_sec=0)
    pos = max(int(e) for e in dst.current().epochs if int(e) >= 0)
    hops = cascade_until_current(spark, src, dst, pos)
    assert len(hops) == 1 and not hops[0].get("snapshot_bootstrap")
    assert sorted(map(tuple, dst.read(spark).collect())) == sorted(
        map(tuple, src.read(spark).collect())
    )
    # registry delete of the cascade task drops the pin
    from milvus_cdc_spark.streaming.registry import TaskRegistry

    reg = TaskRegistry(str(tmp_path / "tasks"))
    reg.create("c1", {
        "src_table": src.root, "table": dst.root,
        "checkpoint": str(tmp_path / "ck"),
    })
    reg.delete("c1")
    assert pin not in src.pins()


def test_cli_pins_verb_lists_and_unpins(spark, tmp_path, capsys):
    from milvus_cdc_spark.streaming.cli import main

    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    _grow(spark, t, 0, 100, 0)
    t.pin_version("feed-x", 1)
    rc = main(["pins", "--table", t.root])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    (entry,) = out.values()
    assert entry["pins"] == {"feed-x": 1}
    assert entry["current"] == t.current().version
    rc = main(["pins", "--table", t.root, "--unpin", "feed-x"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    (entry,) = out.values()
    assert entry["unpinned"] is True and entry["pins"] == {}


def test_rollup_and_pipeline_rounds_pin_and_rebootstrap(spark, tmp_path):
    """View/pipeline cursor consumers get the same retention treatment
    as publish/cascade: each round pins its base (vacuum can't expire
    it), and an UNPINNED store whose base did expire falls back to the
    bootstrap full refresh — correct because every incremental store is
    fuzz-pinned equivalent to the full recompute."""
    from milvus_cdc_spark.operators.pipeline import run_pipeline_round
    from milvus_cdc_spark.operators.rollup import run_rollup_round
    from milvus_cdc_spark.plans.manifest import consumer_pin_name

    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    log = generate_changelog(spark, 400, evolve=False, drops=False,
                             delete_pct=10)
    _grow(spark, t, 0, 100, 0, log)
    view_store = str(tmp_path / "view")
    pipe_store = str(tmp_path / "pipe")
    r1 = run_rollup_round(spark, t, view_store)
    p1 = run_pipeline_round(spark, t, pipe_store)
    vpin = consumer_pin_name(view_store, "view")
    ppin = consumer_pin_name(pipe_store, "pipeline")
    assert t.pins()[vpin] == r1["version"] == 1
    assert t.pins()[ppin] == p1["version"] == 1
    # pinned: aggressive vacuum keeps the base; the next round is
    # incremental, not a rebootstrap
    _grow(spark, t, 100, 200, 1, log)
    t.vacuum(keep_versions=1, min_age_sec=0)
    assert t.earliest_retained_version() == 1
    r2 = run_rollup_round(spark, t, view_store)
    p2 = run_pipeline_round(spark, t, pipe_store)
    assert not r2["rebootstrapped"] and not p2["rebootstrapped"]
    # unpinned + expired base: the round REBOOTSTRAPS instead of crashing,
    # and the rebuilt view equals the direct full recompute
    t.unpin(vpin)
    t.unpin(ppin)
    _grow(spark, t, 200, 300, 2, log)
    t.vacuum(keep_versions=1, min_age_sec=0)
    assert t.earliest_retained_version() == t.current().version
    r3 = run_rollup_round(spark, t, view_store)
    p3 = run_pipeline_round(spark, t, pipe_store)
    assert r3["rebootstrapped"] and p3["rebootstrapped"]
    from milvus_cdc_spark.operators.rollup import conv_rollup

    got = sorted(map(tuple, spark.read.parquet(
        os.path.join(r3["store"], "view")).collect()))
    want = sorted(map(tuple, conv_rollup(t.read(spark)).collect()))
    assert got == want
    # and the rounds re-pinned themselves
    assert t.pins()[vpin] == t.pins()[ppin] == t.current().version


def test_multi_cascade_delete_unpins_every_source_table(spark, tmp_path):
    """Deleting a multi-cascade task drops the pin on EVERY source table
    of the tree (regression: only single-src_table specs were unpinned,
    so tree pins floored vacuum forever)."""
    from milvus_cdc_spark.streaming.engine import MultiCascadeTask
    from milvus_cdc_spark.plans.manifest import consumer_pin_name
    from milvus_cdc_spark.streaming.registry import TaskRegistry

    src_root = tmp_path / "srcs"
    for name in ("ta", "tb"):
        t = SnapshotTable(str(src_root / name))
        t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
        _grow(spark, t, 0, 100, 0)
    dst_root = str(tmp_path / "dsts")
    task = MultiCascadeTask(
        spark, str(src_root), dst_root, str(tmp_path / "ck"),
    )
    task.start(available_now=True)
    assert task.wait_drained(180)
    for name in ("ta", "tb"):
        src = SnapshotTable(str(src_root / name))
        pin = consumer_pin_name(os.path.join(dst_root, name), "cascade")
        assert src.pins().get(pin) == src.current().version, name
    reg = TaskRegistry(str(tmp_path / "tasks"))
    reg.create("mc", {
        "src_tables_root": str(src_root), "tables_root": dst_root,
        "checkpoint": str(tmp_path / "ck"),
    })
    reg.delete("mc")
    for name in ("ta", "tb"):
        assert SnapshotTable(str(src_root / name)).pins() == {}, name


def test_cli_pins_verb_resolves_registered_task_sources(spark, tmp_path, capsys):
    """'pins --name X' for a publish task inspects the SOURCE table (the
    pin lives there), not the feed (regression: it KeyError'd on
    tables_root / inspected the cascade target)."""
    from milvus_cdc_spark.streaming.cli import main
    from milvus_cdc_spark.plans.manifest import consumer_pin_name
    from milvus_cdc_spark.streaming.publish import publish_round
    from milvus_cdc_spark.streaming.registry import TaskRegistry

    t = SnapshotTable(str(tmp_path / "src"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    _grow(spark, t, 0, 100, 0)
    feed = str(tmp_path / "feed")
    publish_round(spark, t, feed)
    reg = TaskRegistry(str(tmp_path / "tasks"))
    reg.create("p1", {
        "src_table": t.root, "publish_out": feed,
        "checkpoint": str(tmp_path / "ck"),
    })
    rc = main(["pins", "--name", "p1", "--tasks-dir", str(tmp_path / "tasks")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    (entry,) = out.values()
    assert entry["pins"] == {
        consumer_pin_name(feed, "publish"): t.current().version
    }


def test_position_reports_retention_pin(spark, tmp_path):
    """Spark-free `position` surfaces the retention pin a cascade or
    publish task holds on its source — the operator sees which version
    floors the source's vacuum without a separate pins call."""
    from milvus_cdc_spark.streaming.registry import TaskRegistry

    src = SnapshotTable(str(tmp_path / "src"))
    src.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    _grow(spark, src, 0, 100, 0)
    feed = str(tmp_path / "feed")
    publish_round(spark, src, feed)
    dst = SnapshotTable(str(tmp_path / "dst"))
    create_target_like(src, dst)
    cascade_until_current(spark, src, dst, 0)
    reg = TaskRegistry(str(tmp_path / "tasks"))
    reg.create("p1", {"src_table": src.root, "publish_out": feed,
                      "checkpoint": str(tmp_path / "ckp")})
    reg.create("c1", {"src_table": src.root, "table": dst.root,
                      "checkpoint": str(tmp_path / "ckc")})
    cur = src.current().version
    assert reg.position("p1")["retention_pin"] == cur
    assert reg.position("c1")["retention_pin"] == cur
