"""TableFS abstraction (plans/fs.py): the eight verbs the manifest
protocol needs, pinned at unit level — plus the manifest running through
it (creation, lease election, vacuum walk) and the pin/vacuum TOCTOU
closure (pins land under the commit lease and fail loudly below the
retained floor)."""

import json
import os
import threading

import pytest

from milvus_cdc_spark.plans.fs import LocalFS, get_fs
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark import schemas as S


def test_get_fs_resolves_local_and_rejects_object_stores(tmp_path):
    assert get_fs(str(tmp_path)) is get_fs("file:///x")
    with pytest.raises(NotImplementedError, match="s3"):
        get_fs("s3://bucket/table")


def test_write_text_atomic_and_read(tmp_path):
    fs = LocalFS()
    p = str(tmp_path / "CURRENT")
    fs.write_text_atomic(p, "7")
    assert fs.read_text(p) == "7"
    fs.write_text_atomic(p, "8")  # replace, not append
    assert fs.read_text(p) == "8"
    assert not fs.exists(p + ".tmp")  # no tmp residue


def test_create_exclusive_elects_one_winner(tmp_path):
    fs = LocalFS()
    p = str(tmp_path / "LEASE")
    wins = sum(
        fs.create_exclusive(p, f"owner-{i}") for i in range(8)
    )
    assert wins == 1


def test_delete_if_unchanged_is_conditional(tmp_path):
    fs = LocalFS()
    p = str(tmp_path / "LEASE")
    fs.write_text_atomic(p, json.dumps({"owner": "a"}))
    token = fs.read_token(p)
    # holder renews (content+mtime change) → stale token must NOT delete
    os.utime(p, (1, 1))
    renewed_token = fs.read_token(p)
    assert not fs.delete_if_unchanged(p, token)
    assert fs.exists(p)
    assert fs.delete_if_unchanged(p, renewed_token)
    assert not fs.exists(p)
    assert not fs.delete_if_unchanged(p, renewed_token)  # already gone


def test_listdir_walk_and_prune(tmp_path):
    fs = LocalFS()
    assert fs.listdir(str(tmp_path / "missing")) == []
    d = tmp_path / "data" / "bucket=0"
    d.mkdir(parents=True)
    (d / "f.parquet").write_text("x" * 10)
    (tmp_path / "data" / "bucket=1").mkdir()
    assert fs.listdir(str(d / "f.parquet")) == []  # non-container
    walked = fs.walk_files(str(tmp_path / "data"))
    assert len(walked) == 1 and walked[0][2] == 10
    fs.delete(walked[0][0])
    fs.prune_empty_dirs(str(tmp_path / "data"))
    assert os.path.isdir(tmp_path / "data")  # root itself kept
    assert fs.listdir(str(tmp_path / "data")) == []


def test_manifest_protocol_runs_through_fs(tmp_path):
    """Create → commit-pointer reads → concurrent lease election →
    pins — all through the abstraction (SnapshotTable.fs)."""
    t = SnapshotTable(str(tmp_path / "t"))
    m = t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    assert t.exists() and t.current().version == m.version
    winners = []
    barrier = threading.Barrier(4)

    def contender(i):
        barrier.wait()
        try:
            with t.commit_lease(owner=f"c{i}", timeout_sec=0.2):
                winners.append(i)
                import time

                time.sleep(0.4)
        except Exception:
            pass

    ts = [threading.Thread(target=contender, args=(i,)) for i in range(4)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert len(winners) == 1  # exactly one holder inside the section
    t.pin_version("feed-x", 0)
    assert t.pins() == {"feed-x": 0}
    assert t.unpin("feed-x") and t.pins() == {}


def test_pin_below_retained_floor_refuses_loudly(spark, tmp_path):
    """The TOCTOU closure: a pin targeting a version vacuum already
    expired raises (and leaves no pin behind) instead of being silently
    accepted and then expired out from under the consumer."""
    from pyspark.sql import functions as F

    from milvus_cdc_spark.operators.apply import apply_batch
    from milvus_cdc_spark.sources.changelog_gen import generate_changelog

    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2)
    log = generate_changelog(spark, 300, num_partitions=2)
    for ep in range(3):
        apply_batch(
            spark, t,
            log.filter(
                (F.col("lsn") >= ep * 100) & (F.col("lsn") < (ep + 1) * 100)
            ),
            epoch=ep,
        )
    t.vacuum(keep_versions=1, min_age_sec=0.0)
    floor = t.earliest_retained_version()
    assert floor > 0
    with pytest.raises(ValueError, match="below the retained floor"):
        t.pin_version("late-feed", 0)
    assert "late-feed" not in t.pins()
    t.pin_version("ok-feed", floor)  # at/above the floor still lands
    assert t.pins()["ok-feed"] == floor
