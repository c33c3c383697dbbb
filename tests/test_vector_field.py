"""Vector-field (FLOAT_VECTOR analogue) replication.

The reference replicates collections whose payload includes dense
vectors — its own e2e schema is INT64/FLOAT/VARCHAR/FLOAT_VECTOR(dim=128)
(/root/reference/tests/base/checker.py:17-25) and the delete-verify
script runs over 100k real vectors (tests/scripts/verify_delete.py).
Here `array<float>` is a first-class manifest column type: storable at
create or via ADD_COLUMN, carried through CoW merge and MOR resolution
as parquet list columns, recovered from the dynamic JSON bag
(manifest.bag_decode) for rows applied before the DDL, and surfaced by
changes() diffs.
"""

import json
from datetime import datetime

from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch, bootstrap_table
from milvus_cdc_spark.plans.manifest import SnapshotTable

VEC_COLUMNS = S.TRANSCRIPTS_BASE_COLUMNS + [("embedding", "array<float>")]


def _vec(lsn: int) -> list[float]:
    # integer-valued floats: exact under float32 round-trip
    return [float(lsn % 7), float(lsn % 5), float(lsn % 3), 1.0]


def _ev(lsn, conv, turn, text, sec, op="INSERT", vec=None):
    extra = {"embedding": json.dumps(vec if vec is not None else _vec(lsn))}
    role = "user" if op != S.OP_DELETE else None
    return (lsn, datetime(2024, 1, 1, 0, 0, sec), 0, op, conv, turn,
            role, text, None, None, extra if op != S.OP_DELETE else None)


def _mk(spark, rows):
    return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)


def _state(spark, t):
    return {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["embedding"])
        for r in t.read(spark).collect()
    }


def test_vector_column_at_create_roundtrips(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tv"))
    t.create(VEC_COLUMNS, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        _ev(1, "c1", 1, "a", 1),
        _ev(2, "c2", 1, "b", 2),
    ]), 0)
    st = _state(spark, t)
    assert st[("c1", 1)] == ("a", _vec(1))
    assert st[("c2", 1)] == ("b", _vec(2))
    # stored physically as a parquet list column, not a bag string
    phys = t.read(spark, logical=False)
    assert dict(phys.dtypes)["embedding"] == "array<float>"


def test_vector_last_writer_and_delete(spark, tmp_path):
    """Updates replace the whole vector (last-writer per key); deletes
    remove the row — the verify_delete.py contract."""
    t = SnapshotTable(str(tmp_path / "tv"))
    t.create(VEC_COLUMNS, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        _ev(1, "c1", 1, "a", 1),
        _ev(2, "c2", 1, "b", 1),
        _ev(3, "c3", 1, "c", 1),
    ]), 0)
    apply_batch(spark, t, _mk(spark, [
        _ev(10, "c1", 1, "a2", 5, op="UPSERT"),
        _ev(11, "c2", 1, None, 5, op="DELETE"),
    ]), 1)
    st = _state(spark, t)
    assert set(st) == {("c1", 1), ("c3", 1)}
    assert st[("c1", 1)] == ("a2", _vec(10))
    assert st[("c3", 1)] == ("c", _vec(3))


def test_vector_mor_resolution_and_compact(spark, tmp_path):
    """MOR delta chains resolve vectors to the last writer's; compaction
    folds without changing them."""
    t = SnapshotTable(str(tmp_path / "tv"))
    t.create(VEC_COLUMNS, n_buckets=2, write_mode="mor")
    apply_batch(spark, t, _mk(spark, [_ev(1, "c1", 1, "a", 1),
                                      _ev(2, "c2", 1, "b", 1)]), 0)
    apply_batch(spark, t, _mk(spark, [_ev(10, "c1", 1, "a2", 5,
                                          op="UPSERT")]), 1)
    before = _state(spark, t)
    assert before[("c1", 1)] == ("a2", _vec(10))
    t.compact(spark)
    assert _state(spark, t) == before


def test_vector_add_column_mid_log_recovers_pre_ddl_rows(spark, tmp_path):
    """ADD_COLUMN embedding after rows already landed: pre-DDL rows
    recover their vectors from the dynamic bag at read time (bag_decode);
    post-DDL writes materialize the parquet list column."""
    t = SnapshotTable(str(tmp_path / "tv"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    # epoch 0: vector rides the bag only — no such column yet
    apply_batch(spark, t, _mk(spark, [_ev(1, "c1", 1, "a", 1)]), 0)
    assert "embedding" not in t.read(spark).columns
    add = (5, datetime(2024, 1, 1, 0, 0, 2), 0, "ADD_COLUMN", None, None,
           None, None, None,
           json.dumps({"column": "embedding", "type": "array<float>"}), None)
    apply_batch(spark, t, _mk(spark, [add, _ev(6, "c2", 1, "b", 3)]), 1)
    st = _state(spark, t)
    assert st[("c1", 1)] == ("a", _vec(1))  # recovered from the bag
    assert st[("c2", 1)] == ("b", _vec(6))  # written physically


def test_vector_changes_diff_carries_vectors(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tv"))
    t.create(VEC_COLUMNS, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [_ev(1, "c1", 1, "a", 1),
                                      _ev(2, "c2", 1, "b", 1)]), 0)
    v1 = t.current().version
    apply_batch(spark, t, _mk(spark, [
        _ev(10, "c1", 1, "a2", 5, op="UPSERT"),
        _ev(11, "c2", 1, None, 5, op="DELETE"),
        _ev(12, "c3", 1, "c", 5),
    ]), 1)
    ch = {r["conv_id"]: r for r in t.changes(spark, v1).collect()}
    assert ch["c1"]["change_type"] == "update"
    assert ch["c1"]["embedding"] == _vec(10)  # post-image
    assert ch["c2"]["change_type"] == "delete"
    assert ch["c2"]["embedding"] == _vec(2)  # pre-image
    assert ch["c3"]["change_type"] == "insert"
    assert ch["c3"]["embedding"] == _vec(12)


def test_embedding_neardup_incremental_matches_full_recompute(spark, tmp_path):
    """Bootstrap + N changes()-fed rounds of embedding_neardup_incremental
    ≡ one full-corpus embedding_neardup_lsh_pairs over the final snapshot
    — exact equality (bucket ids and cosine are pure functions of the two
    vectors). The CDC table carries the vectors as an `array<float>`
    column; updates retire stale pairs, deletes remove both sides."""
    from milvus_cdc_spark.operators.dedup import (
        embedding_neardup_incremental,
        embedding_neardup_lsh_pairs,
        embedding_store,
    )

    DIM, TH = 4, 900000

    def vec(g):  # class-derived signed vectors: real dup groups
        return [float(((g % 5) * (i + 3)) % 7 - 3) for i in range(DIM)]

    t = SnapshotTable(str(tmp_path / "tv"))
    t.create(VEC_COLUMNS, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        _ev(i, f"c{i}", 1, "x", 1, vec=vec(i)) for i in range(1, 13)
    ]), 0)

    def corpus(df, *extra):
        return df.select(
            *extra, F.col("conv_id").alias("doc_key"), "embedding"
        )

    kw = dict(threshold_micro=TH, n_planes=2, n_tables=2, dim=DIM)
    boot = corpus(t.read(spark))
    store = embedding_store(boot, id_col="doc_key", vec_col="embedding")
    pairs = embedding_neardup_lsh_pairs(
        boot, id_col="doc_key", vec_col="embedding", **kw
    )
    for i, batch in enumerate([
        [_ev(20, "c3", 1, "x", 5, op="UPSERT", vec=vec(21)),   # flips class
         _ev(21, "c5", 1, None, 5, op="DELETE"),
         _ev(22, "c99", 1, "x", 5, vec=vec(3))],               # new dup
        [_ev(30, "c99", 1, None, 9, op="DELETE"),
         _ev(31, "c1", 1, "x", 9, op="UPSERT", vec=vec(1))],   # same class
    ], start=1):
        v_prev = t.current().version
        apply_batch(spark, t, _mk(spark, batch), i)
        store, pairs = embedding_neardup_incremental(
            store, pairs, corpus(t.changes(spark, v_prev), "change_type"),
            **kw,
        )
    got = {(r["doc_a"], r["doc_b"], r["cosine_micro"]) for r in pairs.collect()}
    full = embedding_neardup_lsh_pairs(
        corpus(t.read(spark)), id_col="doc_key", vec_col="embedding", **kw
    )
    want = {(r["doc_a"], r["doc_b"], r["cosine_micro"]) for r in full.collect()}
    assert got == want and want  # non-vacuous: dup groups exist


def test_vector_bootstrap_from_snapshot(spark, tmp_path):
    """bootstrap_table JSON-encodes vector columns into the bag; a
    table created with the vector column materializes them typed."""
    t = SnapshotTable(str(tmp_path / "tv"))
    t.create(VEC_COLUMNS, n_buckets=4)
    snap = spark.createDataFrame(
        [("c1", 1, "user", "a", [1.0, 2.0]), ("c2", 1, "user", "b", [3.0, 4.0])],
        "conv_id string, turn_idx int, role string, text string, "
        "embedding array<float>",
    )
    bootstrap_table(spark, t, snap, epoch=0)
    st = _state(spark, t)
    assert st[("c1", 1)] == ("a", [1.0, 2.0])
    assert st[("c2", 1)] == ("b", [3.0, 4.0])
    phys = t.read(spark, logical=False)
    assert dict(phys.dtypes)["embedding"] == "array<float>"


def test_vector_streaming_drain_end_to_end(spark, tmp_path):
    """Full STREAMING path with vector payloads: a generated changelog
    whose DML rows carry a dim-8 embedding in the dynamic bag, plus an
    ADD_COLUMN(embedding array<float>) DDL event landing MID-LOG, drained
    by the streaming engine in multiple micro-batches. Winners applied
    before the DDL recover their vectors from the bag; winners applied
    after get the materialized list column — the final state must match
    the sequential replay oracle exactly, vectors compared element-wise
    (the oracle surfaces bag columns as the raw JSON text)."""
    from milvus_cdc_spark.oracle import replay
    from milvus_cdc_spark.sources import (
        generate_changelog, read_changelog, write_changelog,
    )
    from milvus_cdc_spark.streaming.engine import run_until_drained

    n = 2000
    log_df = generate_changelog(
        spark, n, n_parts=4, n_convs=30, turns_per_conv=10,
        evolve=False, drops=False,
    )
    add = spark.createDataFrame(
        [(n // 2, datetime(2024, 1, 1, 6, 0, 0), 0, S.OP_ADD_COLUMN, None,
          None, None, None, None,
          '{"column": "embedding", "type": "array<float>"}', None)],
        S.CHANGELOG_SCHEMA,
    )
    # keep lsns unique: shift the DML half-way lsn out of the DDL's slot,
    # THEN derive each row's embedding from its final lsn
    log_df = log_df.withColumn(
        "lsn",
        F.when(F.col("lsn") >= n // 2, F.col("lsn") + 1).otherwise(F.col("lsn")),
    )
    emb_json = F.to_json(
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.pmod(F.col("lsn") * i, F.lit(97)).cast("float"),
        )
    )
    log_df = log_df.withColumn(
        "extra",
        F.when(F.col("op") != S.OP_DELETE,
               F.create_map(F.lit("embedding"), emb_json)),
    ).unionByName(add)
    log = str(tmp_path / "log")
    write_changelog(log_df, log, n_files=8)

    task = run_until_drained(
        spark, log, str(tmp_path / "table"), str(tmp_path / "ckpt"),
        max_files_per_trigger=2, n_buckets=8,
    )
    assert len(task.table.current().epochs) >= 3  # genuinely multi-batch

    final = task.table.read(spark)
    assert dict(final.dtypes)["embedding"] == "array<float>"
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["embedding"])
        for r in final.collect()
    }
    rows, _cols = replay(
        [r.asDict() for r in read_changelog(spark, log).collect()]
    )
    want = {}
    for r in rows:
        emb = r.get("embedding")
        want[(r["conv_id"], r["turn_idx"])] = (
            r["text"], json.loads(emb) if emb is not None else None,
        )
    assert got == want
    # every winner's vector is the pure function of its lsn
    for r in final.collect():
        assert r["embedding"] == [float((r["lsn"] * i) % 97) for i in range(1, 9)]
