"""Incremental materialized-view maintenance (IVM) over a SnapshotTable:
keep a grouped-aggregate view (e.g. per-conversation transcript rollups)
current by ``changes()`` diffs — recompute ONLY the groups the diff
touches, reading ONLY the buckets that hold them.

Reference analogue: downstream consumers of a replicated Milvus
collection re-derive their serving views after each replication batch
(the reason milvus-cdc exists is to keep such consumers fresh); here the
view advances in the same O(|diff|) budget as the replication itself.

The maintenance identity, valid for ANY per-group aggregate: a group's
rows can only change if some row carrying that group key appears in the
diff — insert/update rows carry the post-image key, delete rows the
pre-image key (the ``changes()`` contract) — so recomputing exactly the
affected groups from the current snapshot and splicing them over the
store is equivalent to a full recompute. Groups whose last row was
deleted drop naturally (no refreshed row survives the splice).

Cost model at 100 TB: |affected keys| ∝ |diff|, and they broadcast
(diffs are epoch-sized); the refresh scan is bucket-pruned to the
touched buckets via :func:`touched_buckets` (the same manifest pruning
``changes()`` itself uses), so a maintenance round reads ∝ changed
buckets, never the table. For long round chains, persist or
``localCheckpoint`` the store periodically — each splice adds one
anti-join + union to its lineage.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def touched_buckets(
    changes: DataFrame, n_buckets: int, key_col: str = "conv_id"
) -> list[int]:
    """Bucket ids the diff touches, computed with the manifest's bucket
    function (``pmod(xxhash64(conv_id), n_buckets)`` —
    plans/manifest.py); pass to ``SnapshotTable.read(buckets=…)`` so the
    group refresh scans only files that can hold affected groups. One
    distinct over diff-sized data, driver-materialized (bucket ids are
    ≤ n_buckets values)."""
    rows = (
        changes.select(
            F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    )
    return sorted(r["b"] for r in rows)


def advance_rollup(
    store: DataFrame,
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    agg_fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Splice a grouped-aggregate view forward by one CDC diff.

    ``store``: the previous view rows (``agg_fn`` output schema).
    ``snapshot``: the CURRENT table state — at scale, pre-pruned to the
    diff's buckets (``table.read(spark, buckets=touched_buckets(…))``).
    ``changes``: a ``SnapshotTable.changes()`` diff carrying ``keys``.
    ``agg_fn``: df → one row per group; re-run ONLY over affected groups.

    Affected keys broadcast twice (diff-sized): a left-semi join prunes
    the snapshot scan to affected groups, a left-anti join retires those
    groups' stale view rows; refreshed rows union in. Invariant
    (oracle-checked by ``cdc_rollup_incremental``): bootstrap + N rounds
    ≡ ``agg_fn`` over the final snapshot."""
    keys = list(keys)
    aff = changes.select(*keys).distinct()
    refreshed = agg_fn(snapshot.join(F.broadcast(aff), keys, "left_semi"))
    return (
        store.join(F.broadcast(aff), keys, "left_anti")
        .unionByName(refreshed)
    )


def run_rollup_round(
    spark,
    table,
    store_dir: str,
    *,
    agg_fn: Callable[[DataFrame], DataFrame] = None,
    keys: Sequence[str] = ("conv_id",),
) -> dict:
    """One idempotent IVM round against a live ``SnapshotTable`` — the
    serving-view refresh a consumer runs after each replication batch:
    advance the view by ``changes()`` since the last processed version
    (full ``agg_fn`` over the table only on the very first round),
    persist it, move the cursor.

    Persistence protocol mirrors
    :func:`~milvus_cdc_spark.operators.pipeline.run_pipeline_round`:
    the view lives in ``v{version}/view`` parquet under ``store_dir``;
    ``cursor.json`` is written LAST via temp + ``os.replace`` — the
    commit point, so a crash mid-round leaves the previous round intact
    and the next invocation redoes the interrupted one (``changes()``
    and the splice are pure functions of their inputs; the round is
    idempotent). A round where the table hasn't advanced is a no-op.

    Bucket pruning applies when the group keys include ``conv_id`` (the
    manifest's bucket column): the refresh then reads only the diff's
    buckets; other groupings refresh from a full logical read."""
    import json
    import os
    import shutil

    if agg_fn is None:
        agg_fn = conv_rollup
    keys = list(keys)
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
        # the diff base was expired by vacuum (pre-pin store, or an
        # operator unpinned it): a view is a pure function of the
        # current snapshot, so fall back to the bootstrap full refresh —
        # correct, just not ∝ diff this once
        cursor = None
        rebootstrapped = True

    if cursor is None:
        view = agg_fn(table.read(spark))
    else:
        prev = spark.read.parquet(
            os.path.join(store_dir, cursor["dir"], "view")
        )
        diff = table.changes(spark, cursor["version"])
        snap = table.read(
            spark,
            buckets=(
                touched_buckets(diff, cur_m.n_buckets)
                if "conv_id" in keys
                else None
            ),
        )
        view = advance_rollup(prev, snap, diff, keys, agg_fn)

    vdir = f"v{cur_m.version}"
    out = os.path.join(store_dir, vdir, "view")
    view.write.mode("overwrite").parquet(out)
    n_groups = spark.read.parquet(out).count()
    tmp = cursor_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": cur_m.version, "dir": vdir}, f)
    os.replace(tmp, cursor_path)  # the commit point
    # retention coordination: pin the version the next round diffs FROM
    # so the table's vacuum can't expire this view's base
    from milvus_cdc_spark.plans.manifest import consumer_pin_name

    table.pin_version(consumer_pin_name(store_dir, "view"), cur_m.version)
    for d in os.listdir(store_dir):  # retire superseded store versions
        if d.startswith("v") and d != vdir and os.path.isdir(
            os.path.join(store_dir, d)
        ):
            shutil.rmtree(os.path.join(store_dir, d), ignore_errors=True)
    return {
        "skipped": False,
        "version": cur_m.version,
        "n_groups": n_groups,
        "rebootstrapped": rebootstrapped,
        "store": os.path.join(store_dir, vdir),
    }


def conv_rollup(df: DataFrame) -> DataFrame:
    """Transcript assembly at the conversation grain: turn count, char
    count, md5 fingerprint of the texts concatenated in stable turn
    order, and the newest ts. (conv_id, turn_idx) is unique in any
    snapshot, so ``array_sort`` on the (turn_idx, text) struct is a
    total order and the fingerprint is deterministic. Pure JVM
    aggregates — one HashAggregate-style shuffle on conv_id."""
    ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
    return df.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.md5(
            F.array_join(F.transform(ordered, lambda s: s["text"]), "\n")
        ).alias("transcript_fp"),
        F.max("ts").alias("last_ts"),
    )
