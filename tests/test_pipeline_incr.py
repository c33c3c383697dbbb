"""Incremental training-shard pipeline (operators/pipeline.py): quality
gate → exact-dedup keeper → token-window chunks, maintained by CDC diffs.
The invariant throughout: bootstrap + N incremental rounds ≡ one full
recompute (filter → dedup → chunk) over the final corpus — the same
oracle doc_pipeline_incremental pins against DuckDB at sf0.01."""

from datetime import datetime

from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.functions import text as TXT
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.operators.dedup import (
    dedup_exact_incremental,
    dedup_store,
)
from milvus_cdc_spark.operators.pipeline import (
    quality_gate_diff,
    shard_store,
    shards_incremental,
    training_shards,
)
from milvus_cdc_spark.plans.manifest import SnapshotTable

CHANGES_SCHEMA = "change_type string, doc_key string, text string"
GATE = 500  # "the and ..." scores 1000+; stopword-free junk scores < 100


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _corpus(spark, pairs):
    return spark.createDataFrame(pairs, "doc_key string, text string")


def _full(spark, final_pairs, window=2, stride=1):
    """The recompute the incremental path must equal: filter → dedup →
    chunk over the final corpus, emitted keeper-only."""
    q = _corpus(spark, final_pairs).filter(
        TXT.quality_score_milli(F.col("text")) >= GATE
    )
    empty = spark.createDataFrame([], CHANGES_SCHEMA)
    return training_shards(
        shard_store(q, window=window, stride=stride),
        dedup_exact_incremental(dedup_store(q), empty),
    )


def test_quality_gate_diff_semantics(spark):
    """insert-below-gate vanishes; update-below-gate becomes a delete
    (the doc LEAVES the filtered corpus); passing rows and deletes ride
    through unchanged."""
    diff = spark.createDataFrame(
        [("insert", "a", "zz junk"),          # fails → dropped
         ("insert", "b", "the and of one"),   # passes → stays insert
         ("update", "c", "qq ww"),            # fails → becomes delete
         ("update", "d", "the and of two"),   # passes → stays update
         ("delete", "e", "whatever text")],   # delete always rides through
        CHANGES_SCHEMA,
    )
    got = {r["doc_key"]: r["change_type"]
           for r in quality_gate_diff(diff, min_score_milli=GATE).collect()}
    assert got == {"b": "insert", "c": "delete", "d": "update", "e": "delete"}


def test_shards_incremental_matches_full_recompute(spark):
    """One incremental round (insert + update + delete + below-gate
    insert) over the chunk store equals chunking the final filtered
    corpus from scratch."""
    boot = _corpus(spark, [
        ("a", "the and one two"),
        ("b", "the and one two"),
        ("c", "the and three"),
    ])
    shards = shard_store(boot, window=2, stride=1)
    diff = quality_gate_diff(
        spark.createDataFrame(
            [("delete", "a", "the and one two"),
             ("update", "c", "the and four five"),
             ("insert", "d", "zz junk"),
             ("insert", "e", "the and six")],
            CHANGES_SCHEMA,
        ),
        min_score_milli=GATE,
    )
    got = shards_incremental(shards, diff, window=2, stride=1)
    want = shard_store(
        _corpus(spark, [
            ("b", "the and one two"),
            ("c", "the and four five"),
            ("e", "the and six"),
        ]),
        window=2, stride=1,
    )
    assert _rows(got) == _rows(want)
    # the updated doc's OLD chunks are gone, new ones present
    c_chunks = {r["chunk_text"] for r in got.filter("doc_key = 'c'").collect()}
    assert c_chunks == {"the and", "and four", "four five"}


def test_keeper_flip_emits_without_rechunk(spark):
    """Deleting a group's keeper promotes its duplicate: the duplicate's
    chunks appear in the emission purely by flag flip — the chunk store
    row count for that doc is unchanged across the round (chunks were
    maintained all along, never recomputed)."""
    boot = _corpus(spark, [
        ("a", "the and one two"),   # keeper (min key)
        ("b", "the and one two"),   # duplicate, suppressed
    ])
    store = dedup_exact_incremental(
        dedup_store(boot), spark.createDataFrame([], CHANGES_SCHEMA)
    )
    shards = shard_store(boot, window=2, stride=1)
    before = training_shards(shards, store)
    assert {r["doc_key"] for r in before.collect()} == {"a"}
    b_chunks_before = _rows(shards.filter("doc_key = 'b'"))

    diff = spark.createDataFrame(
        [("delete", "a", "the and one two")], CHANGES_SCHEMA
    )
    store2 = dedup_exact_incremental(store, diff)
    shards2 = shards_incremental(shards, diff, window=2, stride=1)
    after = training_shards(shards2, store2)
    assert {r["doc_key"] for r in after.collect()} == {"b"}
    # b's stored chunks are byte-identical — only the join flag moved
    assert _rows(shards2.filter("doc_key = 'b'")) == b_chunks_before
    assert _rows(after) == _rows(_full(spark, [("b", "the and one two")]))


def test_gate_crossing_update_retires_then_readmits(spark):
    """A doc updated BELOW the gate leaves the emission; a later update
    back ABOVE the gate re-admits it with fresh chunks — both rounds
    equal the full recompute of their moment's corpus."""
    boot = _corpus(spark, [("a", "the and one"), ("b", "the and seven")])
    store = dedup_exact_incremental(
        dedup_store(boot), spark.createDataFrame([], CHANGES_SCHEMA)
    )
    shards = shard_store(boot, window=2, stride=1)

    down = quality_gate_diff(
        spark.createDataFrame([("update", "a", "zz junk")], CHANGES_SCHEMA),
        min_score_milli=GATE,
    )
    store = dedup_exact_incremental(store, down)
    shards = shards_incremental(shards, down, window=2, stride=1)
    assert _rows(training_shards(shards, store)) == _rows(
        _full(spark, [("b", "the and seven")])
    )

    up = quality_gate_diff(
        spark.createDataFrame(
            [("update", "a", "the and eight")], CHANGES_SCHEMA
        ),
        min_score_milli=GATE,
    )
    store = dedup_exact_incremental(store, up)
    shards = shards_incremental(shards, up, window=2, stride=1)
    assert _rows(training_shards(shards, store)) == _rows(
        _full(spark, [("a", "the and eight"), ("b", "the and seven")])
    )


def test_pipeline_over_cdc_table_changes(spark, tmp_path):
    """End-to-end over a real SnapshotTable: bootstrap from epoch 0,
    advance the stores with the table's changes() diff after epoch 1
    (which inserts, updates across the gate, and deletes), and land on
    the full recompute of the final table state."""
    table = SnapshotTable(str(tmp_path / "t"))
    table.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)

    def ev(lsn, conv, turn, text, sec, op="INSERT"):
        role = "user" if op != S.OP_DELETE else None
        return (lsn, datetime(2024, 1, 1, 0, 0, sec), 0, op, conv, turn,
                role, text, None, None, None)

    def corpus(df, *extra):
        return df.select(
            *extra,
            F.concat("conv_id", F.lit("#"),
                     F.col("turn_idx").cast("string")).alias("doc_key"),
            "text",
        )

    apply_batch(spark, table, spark.createDataFrame([
        ev(1, "c1", 1, "the and one two", 1),
        ev(2, "c2", 1, "the and one two", 1),   # dup of c1#1
        ev(3, "c3", 1, "zz junk", 1),           # below gate from birth
    ], S.CHANGELOG_SCHEMA), 0)

    boot = corpus(table.read(spark)).filter(
        TXT.quality_score_milli(F.col("text")) >= GATE
    )
    store = dedup_exact_incremental(
        dedup_store(boot), spark.createDataFrame([], CHANGES_SCHEMA)
    )
    shards = shard_store(boot, window=2, stride=1)

    v0 = table.current().version
    apply_batch(spark, table, spark.createDataFrame([
        ev(4, "c1", 1, None, 2, S.OP_DELETE),          # keeper leaves
        ev(5, "c3", 1, "the and three", 2, S.OP_UPSERT),  # crosses gate up
        ev(6, "c4", 1, "the and four", 2),
    ], S.CHANGELOG_SCHEMA), 1)

    gated = quality_gate_diff(
        corpus(table.changes(spark, v0), "change_type"),
        min_score_milli=GATE,
    )
    store = dedup_exact_incremental(store, gated)
    shards = shards_incremental(shards, gated, window=2, stride=1)
    assert _rows(training_shards(shards, store)) == _rows(_full(spark, [
        ("c2#1", "the and one two"),
        ("c3#1", "the and three"),
        ("c4#1", "the and four"),
    ]))


def test_run_pipeline_round_persistent_rounds(spark, tmp_path):
    """run_pipeline_round end-to-end: bootstrap round (full read), one
    diff round, a no-op round (cursor == current), each committing
    stores + cursor atomically — and the emitted shards always equal a
    full recompute over the live corpus."""
    import json as _json
    import os

    from milvus_cdc_spark.operators.pipeline import run_pipeline_round

    def ev(lsn, conv, turn, text, sec, op="INSERT"):
        role = "user" if op != S.OP_DELETE else None
        return (lsn, datetime(2024, 1, 1, 0, 0, sec), 0, op, conv, turn,
                role, text, None, None, None)

    table = SnapshotTable(str(tmp_path / "t"))
    table.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    store = str(tmp_path / "store")
    out = str(tmp_path / "shards")
    os.makedirs(store)

    apply_batch(spark, table, spark.createDataFrame([
        ev(1, "c1", 1, "the and one two", 1),
        ev(2, "c2", 1, "the and one two", 1),   # dup of c1#1
        ev(3, "c3", 1, "zz junk", 1),           # below gate
    ], S.CHANGELOG_SCHEMA), 0)

    r0 = run_pipeline_round(
        spark, table, store, min_score_milli=GATE, window=2, stride=1,
        out_dir=out,
    )
    assert not r0["skipped"] and r0["from_version"] is None
    assert _rows(spark.read.parquet(out)) == _rows(_full(spark, [
        ("c1#1", "the and one two"),
        ("c2#1", "the and one two"),
    ], window=2, stride=1))

    apply_batch(spark, table, spark.createDataFrame([
        ev(4, "c1", 1, None, 2, S.OP_DELETE),             # keeper leaves
        ev(5, "c3", 1, "the and three", 2, S.OP_UPSERT),  # crosses gate up
        ev(6, "c4", 1, "the and four", 2),
    ], S.CHANGELOG_SCHEMA), 1)

    r1 = run_pipeline_round(
        spark, table, store, min_score_milli=GATE, window=2, stride=1,
        out_dir=out,
    )
    assert not r1["skipped"] and r1["from_version"] == r0["version"]
    assert _rows(spark.read.parquet(out)) == _rows(_full(spark, [
        ("c2#1", "the and one two"),
        ("c3#1", "the and three"),
        ("c4#1", "the and four"),
    ], window=2, stride=1))
    # superseded store version was retired; cursor points at the live one
    vdirs = [d for d in os.listdir(store) if d.startswith("v")]
    cur = _json.load(open(os.path.join(store, "cursor.json")))
    assert vdirs == [cur["dir"]]

    r2 = run_pipeline_round(spark, table, store, min_score_milli=GATE)
    assert r2["skipped"] and r2["version"] == r1["version"]


def test_pipeline_cli_verb(spark, tmp_path):
    """CLI surface: `pipeline --table ... --store ... --out ...` runs one
    round in a fresh process and reports the round summary."""
    import json as _json
    import os
    import subprocess
    import sys

    def ev(lsn, conv, turn, text, sec, op="INSERT"):
        role = "user" if op != S.OP_DELETE else None
        return (lsn, datetime(2024, 1, 1, 0, 0, sec), 0, op, conv, turn,
                role, text, None, None, None)

    table = SnapshotTable(str(tmp_path / "t"))
    table.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4)
    apply_batch(spark, table, spark.createDataFrame([
        ev(1, "c1", 1, "the and one two", 1),
        ev(2, "c2", 1, "the and five", 1),
    ], S.CHANGELOG_SCHEMA), 0)

    store = str(tmp_path / "store")
    out = str(tmp_path / "shards")
    os.makedirs(store)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "milvus_cdc_spark.streaming.cli", "pipeline",
         "--table", str(tmp_path / "t"), "--store", store, "--out", out,
         "--min-score-milli", str(GATE), "--window", "2", "--stride", "1",
         "--master", "local[2]"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = _json.loads(r.stdout.strip().splitlines()[-1])
    assert res["skipped"] is False and res["n_shards"] > 0
    assert _rows(spark.read.parquet(out)) == _rows(_full(spark, [
        ("c1#1", "the and one two"),
        ("c2#1", "the and five"),
    ], window=2, stride=1))
