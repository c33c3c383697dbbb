"""Incremental training-shard pipeline over CDC diffs.

The standard large-corpus preparation chain — quality gate → exact dedup
→ token-window chunking — maintained INCREMENTALLY by
``SnapshotTable.changes()`` diffs instead of recomputed per run. Each
round's expensive text work (quality scoring + chunking) costs ∝ |diff|;
the only full-store touch is the skinny keeper recompute that
:func:`~milvus_cdc_spark.operators.dedup.dedup_exact_incremental`
already owns (two thin columns, ~40 bytes/doc).

The load-bearing design choice: the chunk store holds chunks for EVERY
quality-passing document, keeper or not, and keeper-ness is applied at
EMISSION time as a join against the dedup store's keep flags. A keeper
flip on an untouched document (its duplicate was deleted elsewhere)
therefore never re-chunks anything — its chunks were maintained all
along; only the flag the join sees changes. The alternative (store only
keepers' chunks) would need the flipped document's TEXT, forcing a
corpus read on every flip.

Reference analogue: none — milvus-cdc replicates collections, it does
not transform them. This is the training-data-pipeline surface the
build brief requires, composed from operators/dedup.py +
functions/text.py, and the composition pattern `changes() → gate →
advance stores → join stores` is the 100 TB shape: a day-over-day
pipeline run reads the diff, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from milvus_cdc_spark.functions import text as TXT


def quality_gate_diff(
    changes: DataFrame,
    key_col: str = "doc_key",
    text_col: str = "text",
    min_score_milli: int = 0,
) -> DataFrame:
    """Re-express a ``changes()`` diff against the quality-FILTERED corpus.

    Downstream incremental operators maintain exactly the corpus "docs
    whose current text scores ≥ ``min_score_milli``", so the diff must be
    rewritten in that corpus's terms:

    - insert whose text fails the gate → the doc never enters the
      filtered corpus: the row VANISHES from the diff;
    - update whose post-image fails the gate → the doc LEAVES the
      filtered corpus: the row becomes a ``delete`` (retire downstream);
    - update whose post-image passes → stays an update (retire + fresh;
      if the pre-image had failed the gate, the retire side is a no-op
      anti-join miss — correct either way);
    - delete → passes through unchanged (retiring an absent key is a
      no-op).

    Scoring runs only over the diff's post-images — cost ∝ |diff|.
    """
    ct = F.col("change_type")
    passing = TXT.quality_score_milli(F.col(text_col)) >= F.lit(min_score_milli)
    return (
        changes.filter((ct == "delete") | (ct == "update") | passing)
        .withColumn(
            "change_type",
            F.when((ct == "update") & ~passing, F.lit("delete")).otherwise(ct),
        )
    )


def shard_store(
    df: DataFrame,
    key_col: str = "doc_key",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Bootstrap the chunk store: one row per (doc, token-window chunk)
    over an (already quality-filtered) corpus — run ONCE, then advance
    with :func:`shards_incremental`. Pure JVM higher-order functions
    (functions/text.py::chunks); empty documents emit no rows."""
    return (
        df.select(
            F.col(key_col).alias("doc_key"),
            F.explode(TXT.chunks(F.col(text_col), window, stride)).alias("c"),
        ).select(
            "doc_key",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def shards_incremental(
    shards: DataFrame,
    changes: DataFrame,
    key_col: str = "doc_key",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Advance the chunk store by a (quality-gated) diff: deleted and
    updated keys' chunks retire via one anti-join, fresh post-images are
    chunked and appended — tokenization/chunking cost ∝ |diff|, never a
    corpus re-chunk. Rounds chain (output is a valid ``shards`` input)."""
    ct = F.col("change_type")
    retired = changes.filter(ct.isin("delete", "update")).select(
        F.col(key_col).alias("doc_key")
    )
    fresh = shard_store(
        changes.filter(ct.isin("insert", "update")),
        key_col, text_col, window, stride,
    )
    # retired is diff-sized — hinted so the chunk store is never shuffled
    # even when the diff arrives without size stats
    return shards.join(
        F.broadcast(retired), "doc_key", "left_anti"
    ).unionByName(fresh)


def training_shards(shards: DataFrame, dedup: DataFrame) -> DataFrame:
    """Emit the training set: chunks of documents that are their exact-dup
    group's keeper — the chunk store joined against the dedup store's
    keep flags (one equi-join of two maintained tables; doc_key is unique
    in the dedup store, so the inner join is a semi-join in effect).

    ``dedup``: (doc_key, fp, keep, group_size) from
    :func:`~milvus_cdc_spark.operators.dedup.dedup_exact_incremental`.
    """
    keepers = dedup.filter(F.col("keep")).select("doc_key")
    return shards.join(keepers, "doc_key")


def _doc_key():
    return F.concat(
        "conv_id", F.lit("#"), F.col("turn_idx").cast("string")
    ).alias("doc_key")


def run_pipeline_round(
    spark,
    table,
    store_dir: str,
    *,
    text_col: str = "text",
    min_score_milli: int = 0,
    window: int = 64,
    stride: int = 48,
    out_dir: str | None = None,
) -> dict:
    """One idempotent round of the incremental training-shard pipeline
    against a live CDC ``SnapshotTable`` — the daily-run surface: read the
    table's ``changes()`` since the last processed version (FULL read only
    on the very first round), advance the dedup + chunk stores by that
    diff, optionally emit the training shards, and move the cursor.

    Persistence layout under ``store_dir``: stores live in a
    ``v{version}/`` directory (``dedup/`` + ``chunks/`` parquet);
    ``cursor.json`` — written LAST via temp + os.replace — is the commit
    point, so a crash mid-round leaves the previous round fully intact
    and the next invocation simply redoes the interrupted one
    (``changes()`` is a pure function of the two versions, and every
    store advance is a pure function of (store, diff) — the whole round
    is idempotent). A round where the table hasn't advanced is a no-op.

    Scale shape: per round, text scoring + chunking cost ∝ |diff|
    (quality_gate_diff / shards_incremental); the only full-store touches
    are the skinny keeper recompute (two thin columns) and the store
    rewrite — and the store rewrite is the Spark-idiomatic trade: parquet
    snapshots of maintained state, no driver-held state, restartable
    anywhere.
    """
    import json
    import os
    import shutil

    from milvus_cdc_spark.operators.dedup import dedup_exact_incremental

    cur_m = table.current()
    cursor_path = os.path.join(store_dir, "cursor.json")
    cursor = None
    if os.path.exists(cursor_path):
        with open(cursor_path) as f:
            cursor = json.load(f)

    if cursor is not None and cursor["version"] >= cur_m.version:
        return {
            "skipped": True,
            "version": cursor["version"],
            "store": os.path.join(store_dir, cursor["dir"]),
        }

    rebootstrapped = False
    if (
        cursor is not None
        and cursor["version"] < table.earliest_retained_version()
    ):
        # diff base expired by vacuum (pre-pin store / manual unpin):
        # every store advance is fuzz-pinned equivalent to the full
        # recompute (tests/test_fuzz_incremental.py), so the bootstrap
        # branch is a CORRECT fallback — just not ∝ diff this once
        cursor = None
        rebootstrapped = True

    if cursor is None:
        # bootstrap: the whole current corpus arrives as one insert diff
        diff = table.read(spark).select(
            _doc_key(), F.col(text_col).alias("text"),
            F.lit("insert").alias("change_type"),
        )
        dedup_prev = spark.createDataFrame([], "doc_key string, fp string")
        chunks_prev = spark.createDataFrame(
            [], "doc_key string, chunk_idx int, chunk_text string, n_tokens int"
        )
    else:
        diff = table.changes(spark, cursor["version"]).select(
            _doc_key(), F.col(text_col).alias("text"), "change_type"
        )
        prev = os.path.join(store_dir, cursor["dir"])
        dedup_prev = spark.read.parquet(os.path.join(prev, "dedup"))
        chunks_prev = spark.read.parquet(os.path.join(prev, "chunks"))

    gated = quality_gate_diff(diff, min_score_milli=min_score_milli)
    dedup = dedup_exact_incremental(dedup_prev.select("doc_key", "fp"), gated)
    chunks = shards_incremental(
        chunks_prev, gated, window=window, stride=stride
    )

    vdir = f"v{cur_m.version}"
    out_root = os.path.join(store_dir, vdir)
    dedup.write.mode("overwrite").parquet(os.path.join(out_root, "dedup"))
    chunks.write.mode("overwrite").parquet(os.path.join(out_root, "chunks"))
    n_shards = None
    if out_dir is not None:
        shards = training_shards(
            spark.read.parquet(os.path.join(out_root, "chunks")),
            spark.read.parquet(os.path.join(out_root, "dedup")),
        )
        shards.write.mode("overwrite").parquet(out_dir)
        n_shards = spark.read.parquet(out_dir).count()

    tmp = cursor_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": cur_m.version, "dir": vdir}, f)
    os.replace(tmp, cursor_path)  # the commit point
    # retention coordination: pin the version the next round diffs FROM
    # so the table's vacuum can't expire this pipeline's base
    from milvus_cdc_spark.plans.manifest import consumer_pin_name

    table.pin_version(
        consumer_pin_name(store_dir, "pipeline"), cur_m.version
    )
    for d in os.listdir(store_dir):  # retire superseded store versions
        if d.startswith("v") and d != vdir and os.path.isdir(
            os.path.join(store_dir, d)
        ):
            shutil.rmtree(os.path.join(store_dir, d), ignore_errors=True)
    return {
        "skipped": False,
        "from_version": None if cursor is None else cursor["version"],
        "version": cur_m.version,
        "store": out_root,
        "n_shards": n_shards,
        "rebootstrapped": rebootstrapped,
    }
