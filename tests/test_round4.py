"""Round-4 integration: manifest-pruned changes(), delete pre-images
across renames, background per-bucket folds that commute with the epoch
writer (prefix-CAS + commit rebase), CoW→MOR conversion, multi-collection
maintenance verbs, and incremental dedup over a CDC diff.

Reference context: one ``maintenance`` verb serves any task shape
(/root/reference/server/cdc_api.go:26-36); incremental consumption of the
replicated table is the Iceberg changelog-scan analogue of the
reference's position-based tailing (server/cdc_impl.go:844-873).
"""

import json
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.plans.manifest import CommitConflictError, SnapshotTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)


def _ins(lsn, conv, turn, text, sec, op="INSERT", part=0, tool=None):
    role = "user" if op != S.OP_DELETE else None
    return (lsn, datetime(2024, 1, 1, 0, 0, sec), part, op, conv, turn,
            role, text, tool, None, None)


def _bucket_of(spark, conv: str, n_buckets: int) -> int:
    return (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(conv)), F.lit(n_buckets)).cast("int"))
        .collect()[0][0]
    )


# ---------------------------------------------------------------------------
# changes(): manifest pruning + pre-image fidelity
# ---------------------------------------------------------------------------

def test_changes_scans_only_touched_buckets(spark, tmp_path):
    """A one-bucket-touched diff must read ONLY that bucket's files on
    both sides — the manifest file-list diff makes incremental reads cost
    ∝ changed buckets (mirror of the bucket-pruning scan guard in
    test_plans.py)."""
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=8)
    convs = [f"c{i}" for i in range(24)]
    apply_batch(spark, t, _mk(spark, [
        _ins(i + 1, c, 1, f"v{i}", 1) for i, c in enumerate(convs)
    ]), 0)
    # sanity: the insert fanned out over several buckets
    assert len(t.current().files) > 2
    v1 = t.current().version
    apply_batch(spark, t, _mk(spark, [_ins(100, "c5", 1, "v5b", 9,
                                           op="UPSERT")]), 1)
    b = _bucket_of(spark, "c5", 8)
    ch = t.changes(spark, v1)
    files = ch.inputFiles()
    assert files, "diff must read the touched bucket"
    assert all(f"bucket={b}" in f for f in files), files
    got = [(r["conv_id"], r["change_type"], r["text"]) for r in ch.collect()]
    assert got == [("c5", "update", "v5b")]


def test_changes_delete_preimage_survives_rename(spark, tmp_path):
    """A delete row's pre-image must surface values under columns RENAMED
    between the two versions (the old physical column carries them)."""
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        _ins(1, "c1", 1, "a", 1, tool="hammer"),
        _ins(2, "c2", 2, "b", 2, tool="wrench"),
    ]), 0)
    v1 = t.current().version
    apply_batch(spark, t, _mk(spark, [
        (10, datetime(2024, 1, 1, 0, 0, 3), 0, "RENAME_COLUMN", None, None,
         None, None, None, '{"from":"tool","to":"tool_name"}', None),
        _ins(11, "c1", 1, None, 4, op="DELETE"),
    ]), 1)
    ch = t.changes(spark, v1)
    assert "tool_name" in ch.columns
    rows = {r["conv_id"]: r for r in ch.collect()}
    assert rows["c1"]["change_type"] == "delete"
    # pre-image: text AND the renamed column carry the old values
    assert rows["c1"]["text"] == "a"
    assert rows["c1"]["tool_name"] == "hammer"
    assert "c2" not in rows  # untouched


def test_changes_metadata_only_drop_partition_not_pruned(spark, tmp_path):
    """DROP_PARTITION is metadata-only: no bucket file list changes, yet
    rows die — the pruning must disable itself when watermarks differ so
    the diff still reports the deletes."""
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        _ins(1, "c1", 1, "a", 1, part=0),
        _ins(2, "c2", 2, "b", 2, part=1),
    ]), 0)
    v1 = t.current().version
    apply_batch(spark, t, _mk(spark, [
        (10, datetime(2024, 1, 1, 0, 30, 0), 0, "DROP_PARTITION", None,
         None, None, None, None, '{"part": 0}', None),
    ]), 1)
    assert t.at_version(v1).files == t.current().files  # metadata-only
    got = {(r["conv_id"], r["change_type"]) for r in
           t.changes(spark, v1).collect()}
    assert got == {("c1", "delete")}


# ---------------------------------------------------------------------------
# background fold ⇄ epoch writer commutation
# ---------------------------------------------------------------------------

def test_epoch_commit_rebases_over_fold(spark, tmp_path):
    """An epoch commit planned BEFORE a fold committed must rebase onto
    the fold (maintenance commits are content-preserving) instead of
    failing the batch; a genuine second-writer epoch still conflicts."""
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2, write_mode="mor")
    apply_batch(spark, t, _mk(spark, [
        _ins(i + 1, f"c{i}", 1, f"v{i}", 1) for i in range(8)
    ]), 0)
    apply_batch(spark, t, _mk(spark, [
        _ins(20 + i, f"c{i}", 1, f"w{i}", 5, op="UPSERT") for i in range(8)
    ]), 1)
    m = t.current()
    b = next(iter(m.files))
    fold = t.compact_buckets(spark, [int(k) for k in m.files])
    assert sorted(fold["folded"]) == sorted(int(k) for k in m.files)
    # epoch commit planned against the pre-fold manifest: rebases
    nm = t.commit(99, append_buckets={int(b): ["data/e99/fake.parquet"]},
                  base=m)
    assert str(99) in nm.epochs
    assert nm.files[b][:-1] == t.at_version(fold["version"]).files[b]
    assert nm.files[b][-1] == "data/e99/fake.parquet"
    # a second WRITER (new epoch in between) still fails loudly
    stale = m
    with pytest.raises(CommitConflictError):
        t.commit(120, append_buckets={int(b): ["data/e120/x.parquet"]},
                 base=stale)


def test_fold_prefix_cas_carries_midfold_deltas(spark, tmp_path, monkeypatch):
    """A bucket that gains a delta while the fold is running: the fold's
    prefix-CAS swaps only the planned prefix for the folded file and
    carries the new delta on top — final state identical to no fold."""
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2, write_mode="mor")
    apply_batch(spark, t, _mk(spark, [
        _ins(i + 1, f"c{i}", 1, f"v{i}", 1) for i in range(8)
    ]), 0)
    m0 = t.current()
    # epoch 1 lands "mid-fold" (the fold planned against m0)
    apply_batch(spark, t, _mk(spark, [
        _ins(20 + i, f"c{i}", 1, f"w{i}", 5, op="UPSERT") for i in range(8)
    ]), 1)
    real_current = t.current
    calls = {"n": 0}

    def plan_against_m0():
        calls["n"] += 1
        return m0 if calls["n"] == 1 else real_current()

    monkeypatch.setattr(t, "current", plan_against_m0)
    fold = t.compact_buckets(spark, [int(k) for k in m0.files])
    assert sorted(fold["folded"]) == sorted(int(k) for k in m0.files)
    m = real_current()
    for b, planned in m0.files.items():
        # folded file(s) + the epoch-1 delta suffix
        assert len(m.files[b]) >= 2
        assert all(f not in planned for f in m.files[b][:1])
    got = {r["conv_id"]: r["text"] for r in t.read(spark).collect()}
    assert got == {f"c{i}": f"w{i}" for i in range(8)}


def test_cow_epoch_mid_fold_is_skipped(spark, tmp_path, monkeypatch):
    """Under CoW an epoch REWRITES bucket content, so a fold planned
    before it must skip those buckets (its output is stale) — the
    prefix-CAS detects the rewrite because the planned prefix is gone."""
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2, write_mode="cow")
    apply_batch(spark, t, _mk(spark, [
        _ins(i + 1, f"c{i}", 1, f"v{i}", 1) for i in range(8)
    ]), 0)
    m0 = t.current()
    apply_batch(spark, t, _mk(spark, [
        _ins(20 + i, f"c{i}", 1, f"w{i}", 5, op="UPSERT") for i in range(8)
    ]), 1)
    real_current = t.current
    calls = {"n": 0}
    monkeypatch.setattr(
        t, "current",
        lambda: (m0 if not calls.update(n=calls["n"] + 1) and calls["n"] == 1
                 else real_current()),
    )
    fold = t.compact_buckets(spark, [int(k) for k in m0.files])
    assert fold["folded"] == []
    assert sorted(fold["skipped"]) == sorted(int(k) for k in m0.files)
    got = {r["conv_id"]: r["text"] for r in t.read(spark).collect()}
    assert got == {f"c{i}": f"w{i}" for i in range(8)}


# ---------------------------------------------------------------------------
# CoW → MOR conversion
# ---------------------------------------------------------------------------

def test_convert_cow_to_mor_continues_tail(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode="cow")
    apply_batch(spark, t, _mk(spark, [
        _ins(i + 1, f"c{i % 6}", i % 3, f"v{i}", i % 50) for i in range(30)
    ]), 0)
    m = t.convert(spark, "mor")
    assert m.write_mode == "mor"
    assert all(len(v) == 1 for v in m.files.values())  # compacted flip
    assert t.convert(spark, "mor").version == m.version  # idempotent
    # the tail continues in MOR: epochs append deltas now
    apply_batch(spark, t, _mk(spark, [
        _ins(100 + i, f"c{i % 6}", i % 3, f"n{i}", 55 + i % 5, op="UPSERT")
        for i in range(30)
    ]), 1)
    m2 = t.current()
    assert any(len(v) > 1 for v in m2.files.values())
    # last-writer state across the conversion boundary
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in t.read(spark).collect()}
    from collections import defaultdict

    want: dict = {}
    events = [(i + 1, f"c{i % 6}", i % 3, f"v{i}", i % 50) for i in range(30)]
    events += [(100 + i, f"c{i % 6}", i % 3, f"n{i}", 55 + i % 5)
               for i in range(30)]
    best: dict = defaultdict(lambda: (-1, -1))
    for lsn, conv, turn, text, sec in events:
        if (sec, lsn) > best[(conv, turn)]:
            best[(conv, turn)] = (sec, lsn)
            want[(conv, turn)] = text
    assert got == want


def test_convert_rejects_bad_mode(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "transcripts"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2)
    with pytest.raises(ValueError):
        t.convert(spark, "zebra")


# ---------------------------------------------------------------------------
# maintenance verbs cover multi-collection tasks
# ---------------------------------------------------------------------------

def test_cli_maintenance_multi_collection(spark, tmp_path, capsys):
    from milvus_cdc_spark.streaming.cli import main

    tables_root = str(tmp_path / "tables")
    for name in ("alpha", os.path.join("ns1", "beta")):
        t = SnapshotTable(os.path.join(tables_root, name))
        t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2, write_mode="mor")
        apply_batch(spark, t, _mk(spark, [
            _ins(1, "c1", 1, "a", 1), _ins(2, "c2", 2, "b", 2),
        ]), 0)
        apply_batch(spark, t, _mk(spark, [
            _ins(10, "c1", 1, "a2", 5, op="UPSERT"),
        ]), 1)
    tasks_dir = str(tmp_path / "tasks")
    from milvus_cdc_spark.streaming.registry import TaskRegistry

    TaskRegistry(tasks_dir).create("m1", {
        "log": str(tmp_path / "log"), "checkpoint": str(tmp_path / "ckpt"),
        "tables_root": tables_root,
    })
    # compact covers BOTH tables of the task, namespaced included
    assert main(["compact", "--name", "m1", "--tasks-dir", tasks_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"alpha", "ns1.beta"}
    for name in ("alpha", "ns1.beta"):
        root = os.path.join(tables_root, *name.split("."))
        assert all(len(v) == 1
                   for v in SnapshotTable(root).current().files.values())
    # vacuum likewise walks the tree (no Spark session needed)
    assert main(["vacuum", "--name", "m1", "--tasks-dir", tasks_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"alpha", "ns1.beta"}
    assert all("deleted_files" in v for v in out.values())
    # logical state intact after both verbs
    got = {r["conv_id"]: r["text"] for r in SnapshotTable(
        os.path.join(tables_root, "alpha")).read(spark).collect()}
    assert got == {"c1": "a2", "c2": "b"}


def test_cli_convert_single_table(spark, tmp_path, capsys):
    from milvus_cdc_spark.streaming.cli import main

    root = str(tmp_path / "single")
    t = SnapshotTable(root)
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2, write_mode="cow")
    apply_batch(spark, t, _mk(spark, [_ins(1, "c1", 1, "a", 1)]), 0)
    assert main(["convert", "--table", root, "--write-mode", "mor"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert list(out.values())[0]["write_mode"] == "mor"
    assert t.current().write_mode == "mor"


# ---------------------------------------------------------------------------
# incremental dedup over a CDC diff
# ---------------------------------------------------------------------------

def test_dedup_exact_incremental_matches_full_recompute(spark):
    from milvus_cdc_spark.operators.dedup import (
        dedup_exact_incremental,
        dedup_store,
    )

    corpus0 = spark.createDataFrame(
        [("a", "same text"), ("b", "same text"), ("c", "unique one")],
        "doc_key string, text string",
    )
    store = dedup_store(corpus0)
    # round: delete the keeper 'a' (→ 'b' becomes keeper), update 'c' into
    # the dup group, insert a brand-new doc 'd'
    changes = spark.createDataFrame(
        [("delete", "a", "same text"),
         ("update", "c", "same text"),
         ("insert", "d", "fresh")],
        "change_type string, doc_key string, text string",
    )
    got = {r["doc_key"]: (r["keep"], r["group_size"])
           for r in dedup_exact_incremental(store, changes).collect()}
    final = spark.createDataFrame(
        [("b", "same text"), ("c", "same text"), ("d", "fresh")],
        "doc_key string, text string",
    )
    want = {r["doc_key"]: (r["keep"], r["group_size"])
            for r in dedup_exact_incremental(
                dedup_store(final),
                spark.createDataFrame([], "change_type string, "
                                          "doc_key string, text string"),
            ).collect()}
    assert got == want == {"b": (True, 2), "c": (False, 2), "d": (True, 1)}


def test_minhash_incremental_matches_full_recompute(spark):
    """bootstrap + one incremental round == full minhash_lsh_pairs over
    the final corpus — exact set equality, the invariant the
    doc_minhash_incremental oracle pins at sf0.01."""
    from milvus_cdc_spark.operators.dedup import (
        minhash_lsh_incremental,
        minhash_lsh_pairs,
        minhash_store,
    )

    corpus0 = spark.createDataFrame(
        [("a", "w1 w2 w3 w4"), ("b", "w1 w2 w3 w4"),
         ("c", "w1 w2 w3 x9"), ("d", "zz yy")],
        "doc_key string, text string",
    )
    store = minhash_store(corpus0)
    pairs = minhash_lsh_pairs(corpus0, id_col="doc_key")
    # delete the exact-dup 'a', update 'c' into the dup group, insert a
    # near-dup 'e' — exercises retire, re-discover, and fresh-fresh paths
    changes = spark.createDataFrame(
        [("delete", "a", "w1 w2 w3 w4"),
         ("update", "c", "w1 w2 w3 w4"),
         ("insert", "e", "w1 w2 w3 q7")],
        "change_type string, doc_key string, text string",
    )
    store, pairs = minhash_lsh_incremental(store, pairs, changes)
    got = {(r["doc_a"], r["doc_b"], r["jaccard_milli"])
           for r in pairs.collect()}
    final = spark.createDataFrame(
        [("b", "w1 w2 w3 w4"), ("c", "w1 w2 w3 w4"),
         ("d", "zz yy"), ("e", "w1 w2 w3 q7")],
        "doc_key string, text string",
    )
    want = {(r["doc_a"], r["doc_b"], r["jaccard_milli"])
            for r in minhash_lsh_pairs(final, id_col="doc_key").collect()}
    assert got == want
    assert ("b", "c", 1000) in got  # the re-discovered exact-dup pair
    assert not any("a" in p[:2] for p in got)  # retired key fully gone
    # store advanced to exactly the final corpus keys
    assert {r["doc_key"] for r in store.select("doc_key").collect()} == \
        {"b", "c", "d", "e"}


def test_minhash_incremental_candidate_join_broadcasts_fresh(spark):
    """The store side must be scanned, never shuffled: the candidate join
    keys the |changes|-sized fresh band rows as a broadcast build side.
    No Exchange may sit between the store scan and the band join, and no
    cartesian anywhere."""
    from milvus_cdc_spark.operators.dedup import (
        minhash_lsh_incremental,
        minhash_lsh_pairs,
        minhash_store,
    )

    corpus0 = spark.createDataFrame(
        [(f"k{i}", f"w{i} w{i + 1} w{i + 2}") for i in range(20)],
        "doc_key string, text string",
    )
    changes = spark.createDataFrame(
        [("insert", "new", "w1 w2 w3")],
        "change_type string, doc_key string, text string",
    )
    # localCheckpoint cuts the bootstrap's lineage out of the plan: the
    # batch bootstrap pass legitimately shuffles O(corpus) ONCE, and this
    # guard is about the per-round incremental joins only
    store0 = minhash_store(corpus0).localCheckpoint()
    pairs0 = minhash_lsh_pairs(corpus0, id_col="doc_key").localCheckpoint()
    _, pairs = minhash_lsh_incremental(store0, pairs0, changes)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" not in plan, (
        "store side shuffled — candidate discovery AND shingle fetch-back "
        "must keep the diff-sized side as the broadcast build side"
    )


def test_chunks_validates_window_stride(spark):
    from milvus_cdc_spark.functions.text import chunks

    with pytest.raises(ValueError):
        chunks(F.col("text"), window=0)
    with pytest.raises(ValueError):
        chunks(F.col("text"), stride=0)
    with pytest.raises(ValueError):
        chunks(F.col("text"), window=8, stride=9)


def test_unknown_op_rows_are_skipped_not_fatal(spark, tmp_path):
    """Msg-type whitelist at the apply boundary (reference F1): a batch
    carrying an op outside the vocabulary (e.g. a newer producer) must
    apply its known rows and SKIP the rest — previously the unknown row
    inflated the distinct-lsn integrity scan but not the event count,
    killing the task with a bogus negative duplicate count."""
    from datetime import datetime

    from milvus_cdc_spark import schemas as S
    from milvus_cdc_spark.operators.apply import apply_batch
    from milvus_cdc_spark.plans.manifest import SnapshotTable

    def ev(lsn, sec, op, conv, turn, text):
        return (lsn, datetime(2024, 1, 1, 0, 0, sec), 0, op, conv, turn,
                "user", text, None, None, None)

    rows = [
        ev(1, 1, "INSERT", "c1", 1, "a"),
        ev(2, 2, "COMPACTION_HINT", "c1", 2, "ignored"),  # unknown op
        ev(3, 3, "UPSERT", "c1", 1, "b"),
    ]
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2)
    res = apply_batch(spark, t, spark.createDataFrame(rows, S.CHANGELOG_SCHEMA), 0)
    assert res["n_events"] == 2
    got = {(r["conv_id"], r["turn_idx"], r["text"])
           for r in t.read(spark).collect()}
    assert got == {("c1", 1, "b")} | set()

    t2 = SnapshotTable(str(tmp_path / "t2"))
    t2.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2)
    apply_batch(
        spark, t2,
        spark.createDataFrame([rows[0], rows[2]], S.CHANGELOG_SCHEMA), 0,
    )
    assert (
        sorted(map(tuple, t.read(spark).collect()))
        == sorted(map(tuple, t2.read(spark).collect()))
    ), "skipping the unknown op must equal never having seen it"


# ---------------------------------------------------------------------------
# rollback: forward-rolling snapshot restore (reference analogue: reset the
# position and replay, server/cdc_impl.go:844-873)
# ---------------------------------------------------------------------------

def _state_set(spark, t):
    return {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read(spark).collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_rollback_restores_state_and_replays_epochs(spark, tmp_path, mode):
    """Rolling back past a bad epoch restores the old content at a NEW
    version (history stays linear, time travel intact), and the restored
    epoch registry makes re-draining REPLAY the undone epoch rather than
    skip it — exactly-once composes with recovery."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode=mode)
    e0 = _mk(spark, [_ins(1, "a", 1, "a1", 1), _ins(2, "b", 1, "b1", 2)])
    e1 = _mk(spark, [
        _ins(3, "a", 1, None, 3, op="DELETE"),
        _ins(4, "c", 1, "c1", 4),
    ])
    apply_batch(spark, t, e0, 0)
    v_good = t.current().version
    good = _state_set(spark, t)
    apply_batch(spark, t, e1, 1)
    v_bad = t.current().version
    bad = _state_set(spark, t)
    assert bad != good

    m = t.rollback(v_good)
    assert m.version == v_bad + 1  # forward-rolling, never rewinds CURRENT
    assert _state_set(spark, t) == good
    # time travel to the undone version still works
    assert t.read(spark, manifest=t.at_version(v_bad)).count() == len(bad)
    # the undone epoch left the registry → re-applying it is NOT skipped
    res = apply_batch(spark, t, e1, 1)
    assert res.get("skipped") is not True
    assert _state_set(spark, t) == bad


def test_rollback_validates_target(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2)
    apply_batch(spark, t, _mk(spark, [_ins(1, "a", 1, "a1", 1)]), 0)
    cur = t.current()
    with pytest.raises(ValueError):
        t.rollback(cur.version + 5)
    assert t.rollback(cur.version).version == cur.version  # no-op
    # a target expired by vacuum fails with a clear retention error,
    # not a raw missing-file traceback
    apply_batch(spark, t, _mk(spark, [_ins(2, "b", 1, "b1", 2)]), 1)
    t.vacuum(keep_versions=1, min_age_sec=0.0)
    with pytest.raises(ValueError, match="expired"):
        t.rollback(cur.version)


def test_rollback_cas_conflict_fails_loudly(spark, tmp_path, monkeypatch):
    """A writer committing between the rollback's plan and its lease must
    make the rollback fail with CommitConflictError, not silently undo
    the racing epoch."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2)
    apply_batch(spark, t, _mk(spark, [_ins(1, "a", 1, "a1", 1)]), 0)
    v1 = t.current().version
    stale = t.current()
    apply_batch(spark, t, _mk(spark, [_ins(2, "b", 1, "b1", 2)]), 1)
    racer = SnapshotTable(t.root)
    monkeypatch.setattr(racer, "current", lambda: stale)
    with pytest.raises(CommitConflictError):
        racer.rollback(v1 - 1)


def test_cli_rollback_round_trip(spark, tmp_path, capsys):
    """CLI verb: rollback --table --to-version restores the snapshot and
    reports the new forward-rolled version."""
    from milvus_cdc_spark.streaming.cli import main

    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=2)
    apply_batch(spark, t, _mk(spark, [_ins(1, "a", 1, "a1", 1)]), 0)
    v_good = t.current().version
    apply_batch(
        spark, t, _mk(spark, [_ins(2, "a", 1, None, 3, op="DELETE")]), 1
    )
    assert main([
        "rollback", "--table", t.root, "--to-version", str(v_good),
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["restored_to"] == v_good
    assert out["version"] == t.current().version
    assert _state_set(spark, t) == {("a", 1, "a1")}
