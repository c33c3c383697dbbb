"""Debezium-envelope EGRESS: publish a SnapshotTable's advance as a CDC feed.

The reference replicates INTO a downstream Milvus; the inverse direction —
feeding arbitrary downstream consumers — is what its users put Kafka
connectors in front of the target for. This module closes the loop inside
the engine: each round publishes the table's net change since the last
published version as standard Debezium JSON-lines envelopes (the same
format ``sources.debezium`` consumes), so ANY Debezium-speaking system —
including another instance of this engine — can tail a replicated table.

Design (the 100 TB shape):

- **Cost ∝ churn, not table size.** A round reads ``changes(prev, cur)``,
  which the manifest file-list diff prunes to changed buckets only; the
  published payload is the net per-key diff (an epoch that rewrote a key
  five times publishes one envelope).
- **Delete ordering is sound across hops.** ``changes_to_ops`` emits
  tombstones at pre-image ts + 1µs (see its docstring) — the published
  feed replays correctly into any last-writer-wins consumer under any
  batching, exactly like a first-level changelog.
- **Crash-safe exactly-once.** Files land under temp names and are
  ``os.replace``d in; ``_cursor.json`` (underscore-prefixed so Spark file sources tailing the
  directory skip it, like _SUCCESS; same temp+replace protocol as the
  rollup/pipeline rounds) commits the round LAST. A crash between file
  publish and cursor commit re-publishes the same round under the same
  deterministic names — consumers keyed on filename, or engines keyed on
  (lsn, ts) last-writer merge, both dedupe naturally.
- **Schema evolution**: evolved columns ride the envelope image's
  ``extra`` bag (values survive); renames/widens/drops are METADATA and a
  Debezium data stream cannot carry them (Debezium splits DDL onto its
  history topic) — a consumer needing promoted columns applies its own
  ADD_COLUMN DDL, or consumes the native changelog / a cascade instead.

The first round bootstraps: the full snapshot publishes as INSERT
envelopes (Debezium's snapshot-read phase), after which rounds are
incremental.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources.debezium import to_debezium
from milvus_cdc_spark.streaming.cascade import changes_to_ops, consumer_pin_name


def _read_cursor(out_dir: str) -> int | None:
    p = os.path.join(out_dir, "_cursor.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def _write_cursor(out_dir: str, version: int) -> None:
    p = os.path.join(out_dir, "_cursor.json")
    fd, tmp = tempfile.mkstemp(dir=out_dir, prefix="_cursor")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, p)


def publish_round(
    spark: SparkSession,
    table: SnapshotTable,
    out_dir: str,
    n_files: int | None = None,
    target_rows_per_file: int = 250_000,
) -> dict[str, Any]:
    """One egress round: publish the table's advance since the cursor as
    Debezium JSON-lines files ``round-<to_version>-<i>.jsonl``.

    ``n_files=None`` (default) sizes the output from the round's actual
    row count (``ceil(rows / target_rows_per_file)``): incremental diffs
    still produce one tidy file, while the BOOTSTRAP round of a large
    table fans out instead of funnelling the entire snapshot through a
    single write task — the scale cliff a fixed n_files=1 had. Pass an
    explicit ``n_files`` to pin the layout.

    Returns ``{published, files, from_version, to_version}``;
    ``published == 0`` with no new files when the table hasn't advanced
    (re-runs are no-ops — the cursor is the commit point)."""
    os.makedirs(out_dir, exist_ok=True)
    cur = table.current()
    prev = _read_cursor(out_dir)
    if prev is not None and prev >= cur.version:
        return {
            "published": 0, "files": [],
            "from_version": prev, "to_version": prev,
        }
    phys = {cur.logical_name(n): n for n, _t in cur.columns}
    if prev is None:
        # bootstrap: the whole snapshot as insert-images (Debezium's
        # snapshot-read phase) through the same ops encoder
        diff = table.read(spark).withColumn("change_type", F.lit("insert"))
    else:
        earliest = table.earliest_retained_version()
        if prev < earliest:
            # Re-bootstrapping here would be WRONG, not just wasteful:
            # rows deleted between the expired cursor and now have no
            # pre-image left to diff, so a fresh snapshot carries no
            # tombstones for them and every consumer keeps ghost rows.
            raise ValueError(
                f"{table.root}: publish cursor v{prev} expired by vacuum "
                f"(earliest retained is v{earliest}) — the feed cannot "
                "be advanced without losing delete events. Point "
                "consumers at a NEW feed directory (full re-bootstrap), "
                "or vacuum the table with more keep_versions than the "
                "publish cadence needs."
            )
        diff = table.changes(spark, prev, cur.version)
    env = to_debezium(changes_to_ops(diff, phys)).persist()
    try:
        n = env.count()
        names: list[str] = []
        if n:
            k = (
                n_files
                if n_files is not None
                else -(-n // max(1, target_rows_per_file))  # ceil
            )
            tmp = tempfile.mkdtemp(dir=out_dir, prefix="_pub_tmp_")
            try:
                env.coalesce(max(1, k)).write.mode("overwrite").text(tmp)
                parts = sorted(
                    f for f in os.listdir(tmp)
                    if f.startswith("part-") and f.endswith(".txt")
                )
                for i, f in enumerate(parts):
                    name = f"round-{cur.version:012d}-{i:05d}.jsonl"
                    os.replace(os.path.join(tmp, f), os.path.join(out_dir, name))
                    names.append(name)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    finally:
        env.unpersist()
    _write_cursor(out_dir, cur.version)
    # retention coordination: pin the version the next round diffs FROM,
    # so the table's vacuum can't expire the feed's base (the error
    # above becomes unreachable in the steady publish→vacuum cadence)
    table.pin_version(consumer_pin_name(out_dir, "publish"), cur.version)
    return {
        "published": n, "files": names,
        "from_version": prev, "to_version": cur.version,
    }
