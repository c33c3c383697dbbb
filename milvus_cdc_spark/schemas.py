"""Schemas for the changelog, target table, lineage and metrics.

Reference analogues:
- changelog row  ~ one TsMsg inside a MsgPack
  (/root/reference/core/api/replicate_msg.go:25-30; pack handling
  core/reader/replicate_channel_manager.go:1169-1491)
- op vocabulary  ~ the whitelist Insert/Delete/DropCollection/DropPartition
  (core/reader/replicate_channel_manager.go:1162-1167) plus the fork's
  Upsert (core/writer/devon_handler.go:152-157) and schema-evolution ops
  standing in for the dynamic-field flag (core/reader/etcd_op.go:646-649).
- ``lsn``        ~ hybrid timestamp total order (server/cdc_impl.go:532-541)
- ``part``       ~ pchannel/vchannel shard (core/model/reader.go:28-47)
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- op vocabulary -----------------------------------------------------------
OP_INSERT = "INSERT"
OP_UPSERT = "UPSERT"
OP_DELETE = "DELETE"
OP_DROP_PARTITION = "DROP_PARTITION"
# table-level truncation — the DropCollectionMsg analogue (one of the four
# whitelisted replicate message types, reference
# core/reader/replicate_channel_manager.go:1162-1167; writer path
# core/writer/channel_writer.go:430-465). Semantics mirror DROP_PARTITION
# at table scope: every row with ts strictly older than the truncate event
# is dead, enforced as a manifest watermark so late-arriving DML older
# than the truncate still loses under any batch ordering.
OP_TRUNCATE = "TRUNCATE"
OP_ADD_COLUMN = "ADD_COLUMN"
OP_RENAME_COLUMN = "RENAME_COLUMN"
# lossless type promotion (int→bigint, float→double) — the Iceberg-spec
# "type promotion" evolution rule, metadata-only: the manifest column type
# flips, old parquet files upcast at scan time (Spark 4 widening reader),
# no data rewrite. Stands in for the reference's AlterCollection schema
# replication (schema changes ride the same op channel as the rest of the
# DDL, core/reader/etcd_op.go:609-660). ddl_arg:
# ``{"column": <logical name>, "type": <wider type>}``.
OP_WIDEN_COLUMN = "WIDEN_COLUMN"

# column removal — the Iceberg drop-column evolution analogue, with NAME
# RETIREMENT convergence semantics: the column leaves the logical schema
# (metadata-only — stored files are untouched and simply stop projecting
# the column), and the name is retired FOREVER — a later ADD_COLUMN with
# a retired name is a documented no-op. Retirement is what makes the op
# safe under the engine's any-batch-order invariant: the retired set is
# MONOTONE (set-union across batches is order-independent), whereas
# Iceberg-style re-add-as-new-field would make the final schema depend on
# whether the DROP's batch applied before or after the ADD's. It also
# rules out resurrection by construction: a dropped physical column can
# never re-enter the read schema, so pre-drop values stay dead without
# field-id machinery or a data rewrite. Key/system columns (conv_id,
# turn_idx, ts, part, lsn) are protected — dropping one is malformed DDL
# (quarantined/fails per on_malformed). ddl_arg:
# ``{"column": <logical name at drop time>}``.
OP_DROP_COLUMN = "DROP_COLUMN"

# key/system columns DROP_COLUMN may never remove: the merge key, the
# ordering identity, and the partition column the drop watermarks target
PROTECTED_COLUMNS = ("conv_id", "turn_idx", "ts", "part", "lsn")

# partial-row update: non-null payload columns overwrite, null payload
# columns are LEFT UNCHANGED — the Debezium/Mongo-$set "patch" shape a
# transcript log needs when a tool RESULT lands on a turn emitted earlier
# (the reference has no analogue: Milvus' data model is insert+delete
# only, core/writer/channel_writer.go:139-212 — this is a beyond-reference
# operator the north-star's "new tool fields" evolution story implies).
# Semantics (declarative, per-column LWW): the final value of column c is
# the value set by the max-(ts,rank,lsn) event that SET c — anchors
# (INSERT/UPSERT/DELETE) set every column, a PATCH sets its non-null
# columns; a row EXISTS iff its max-ord anchor is not a DELETE, and
# patches never create or resurrect rows (a patch whose key has no live
# row when its epoch applies is void). Engine equivalence to this rule
# holds when a patch's (ts,rank,lsn) order agrees with its log order
# relative to other events of the SAME key — the per-key causal ordering
# every real WAL/binlog gives (the reference leans on the identical
# per-channel guarantee, replicate_message_manager.go:84-100).
OP_PATCH = "PATCH"

DML_OPS = (OP_INSERT, OP_UPSERT, OP_DELETE, OP_PATCH)
DDL_OPS = (
    OP_DROP_PARTITION,
    OP_TRUNCATE,
    OP_ADD_COLUMN,
    OP_RENAME_COLUMN,
    OP_WIDEN_COLUMN,
    OP_DROP_COLUMN,
)
ALL_OPS = DML_OPS + DDL_OPS

# namespace (database) lifecycle — the reference replicates
# CreateDatabase/DropDatabase through the same op channel as collection DDL
# (core/writer/channel_writer.go:102-114, idempotent create
# core/writer/milvus_handler.go:253-264). These ride the MULTIPLEXED log
# with ``table_name`` = the bare namespace name; collections inside a
# namespace are named ``<ns>.<table>``. They are handled at the
# multi-collection task level (streaming/engine.py) and never reach
# apply_batch — DROP_NAMESPACE becomes a TRUNCATE watermark fanned out to
# every table in the namespace (same strict-< late-DML-defeat semantics
# as OP_TRUNCATE).
OP_CREATE_NAMESPACE = "CREATE_NAMESPACE"
OP_DROP_NAMESPACE = "DROP_NAMESPACE"
NAMESPACE_OPS = (OP_CREATE_NAMESPACE, OP_DROP_NAMESPACE)

# Ordering rank at equal ts: DELETE applies before DROP_PARTITION applies
# before INSERT/UPSERT — the reference sorts Delete before Insert at equal
# BeginTs (core/reader/replicate_channel_manager.go:1170-1173); the drop
# barrier fires between them. Higher rank wins last-writer-wins.
RANK_DELETE = 0
RANK_DROP = 1
RANK_UPSERT = 2

# --- changelog (the synthetic mutation log; FIXTURES.md §2) ------------------
CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ddl_arg", T.StringType(), True),
        # dynamic-column bag for post-ADD_COLUMN payloads (reference's
        # EnableDynamicField JSON bag, etcd_op.go:646-649)
        T.StructField("extra", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# multiplexed changelog: several collections share one ordered log, each
# event tagged with its collection (reference: replicate messages for all
# collections ride shared pchannels, replicate_channel_manager.go:1169-1491)
# nullable: a null table_name is an UNROUTABLE event — the apply gate
# classifies it as malformed (fail or task-level DLQ) rather than the
# schema rejecting it at parse time.
MULTI_CHANGELOG_SCHEMA = T.StructType(
    list(CHANGELOG_SCHEMA.fields)
    + [T.StructField("table_name", T.StringType(), True)]
)

# --- target table (BASELINE.json input_hint + FIXTURES.md §1) ----------------
# Base (pre-evolution) logical schema of `transcripts`. `part` is the explicit
# partition column targeted by DROP_PARTITION; `lsn` records the applied
# event for lineage/debug (monotonic per key).
TRANSCRIPTS_BASE_COLUMNS: list[tuple[str, str]] = [
    ("conv_id", "string"),
    ("turn_idx", "int"),
    ("role", "string"),
    ("text", "string"),
    ("tool", "string"),
    ("ts", "timestamp"),
    ("part", "int"),
    ("lsn", "bigint"),
]

PAYLOAD_COLUMNS = ("role", "text", "tool")  # evolvable payload set grows via ADD_COLUMN

# --- lineage (reference: positions persisted per pack, server/cdc_impl.go:844-873)
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("start_lsn", T.LongType(), True),
        T.StructField("end_lsn", T.LongType(), True),
        T.StructField("n_insert", T.LongType(), False),
        T.StructField("n_delete", T.LongType(), False),
        T.StructField("n_ddl", T.LongType(), False),
        T.StructField("snapshot_id", T.StringType(), False),
    ]
)

# --- metrics (reference: server/metrics/metrics.go:107-137) ------------------
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_insert", T.LongType(), False),
        T.StructField("n_delete", T.LongType(), False),
        T.StructField("n_ddl", T.LongType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("max_ts", T.TimestampType(), True),
        T.StructField("apply_sec", T.DoubleType(), False),
        # end-to-end replication lag: wall clock at commit − max event ts
        # in the epoch — the reference's headline gauge (replicate_tt lag,
        # server/metrics/metrics.go:107-137). Nullable: epochs with no DML
        # have no event ts; pre-upgrade metric files lack the column.
        T.StructField("lag_sec", T.DoubleType(), True),
        T.StructField("snapshot_id", T.StringType(), False),
    ]
)
