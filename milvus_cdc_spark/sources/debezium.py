"""Debezium-envelope changelog adapter: JSON CDC messages → CHANGELOG rows.

The reference consumes its own replicate-message envelope from an MQ
(/root/reference/core/api/replicate_msg.go:25-30, stream subscribe
core/reader/stream_creator.go:39-159). The public-standard equivalent of
that envelope for relational CDC is Debezium's: one JSON document per
change with ``before``/``after`` row images, an ``op`` code
(``c``\\|``r``\\|``u``\\|``d``), the event timestamp ``ts_ms`` (plus the
microsecond-precision ``ts_us`` Debezium 2.5 added), and a ``source``
block carrying the log position (``lsn``). This module normalizes a
directory/stream of such messages (JSON lines) into ``CHANGELOG_SCHEMA``
so the whole engine — merge, DDL, DLQ, checkpointing — runs unmodified on
a Debezium feed:

    op c (create) / r (snapshot read) → INSERT   (row image = after)
    op u (update)                     → UPSERT   (row image = after)
    op d (delete)                     → DELETE   (row image = before; keys
                                                  + ordering identity only)

Everything stays in built-in JVM expressions (``from_json``/``to_json``,
``timestamp_micros``) — one narrow projection per message, no Python in
the hot path, so the adapter adds a parse-only stage in front of the
unchanged apply plan. Messages that don't parse (``from_json`` → NULL) or
carry an unknown ``op`` surface as malformed rows (null lsn/ts/key) and
flow into the engine's poison-event policy: ``on_malformed='fail'`` stops
before anything commits, ``'dlq'`` quarantines them — exactly the
dead-letter story Kafka-Connect pairs with Debezium.

``to_debezium`` is the inverse (changelog rows → envelope JSON strings),
used by tests and the ``cdc_debezium`` oracle probe to prove the round
trip is lossless at microsecond ts precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from milvus_cdc_spark import schemas as S

# row image carried in before/after (the transcript payload columns)
_IMAGE_FIELDS = [
    ("conv_id", T.StringType()),
    ("turn_idx", T.IntegerType()),
    ("role", T.StringType()),
    ("text", T.StringType()),
    ("tool", T.StringType()),
]

_IMAGE_SCHEMA = T.StructType(
    [T.StructField(n, t, True) for n, t in _IMAGE_FIELDS]
)

# the (subset of the) Debezium payload block we consume. Unknown extra
# fields in real feeds are simply ignored by from_json.
DEBEZIUM_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("before", _IMAGE_SCHEMA, True),
        T.StructField("after", _IMAGE_SCHEMA, True),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("lsn", T.LongType(), True),
                    T.StructField("ts_us", T.LongType(), True),
                    T.StructField("partition", T.IntegerType(), True),
                    T.StructField("table", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ]
)

_OP_DECODE = {"c": S.OP_INSERT, "r": S.OP_INSERT, "u": S.OP_UPSERT}
_OP_ENCODE = {S.OP_INSERT: "c", S.OP_UPSERT: "u", S.OP_DELETE: "d"}


def _normalize(
    raw: DataFrame, value_col: str = "value", multi_table: bool = False
) -> DataFrame:
    """Envelope JSON strings → CHANGELOG_SCHEMA columns (all built-ins).
    ``multi_table=True`` additionally surfaces ``source.table`` as
    ``table_name`` (MULTI_CHANGELOG_SCHEMA) — Debezium's topic-per-table
    fan-in: a missing table routes to the task-level dlq/fail gate."""
    p = F.from_json(F.col(value_col), DEBEZIUM_PAYLOAD_SCHEMA)
    op = (
        F.when(p["op"].isin("c", "r"), F.lit(S.OP_INSERT))
        .when(p["op"] == "u", F.lit(S.OP_UPSERT))
        .when(p["op"] == "d", F.lit(S.OP_DELETE))
    )  # unknown/missing op → NULL → null lsn below → malformed policy
    image = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    ts = F.when(
        p["source"]["ts_us"].isNotNull(),
        F.timestamp_micros(p["source"]["ts_us"]),
    ).otherwise(F.timestamp_millis(p["ts_ms"]))
    cols = [
        F.when(op.isNotNull(), p["source"]["lsn"]).alias("lsn"),
        ts.alias("ts"),
        F.coalesce(p["source"]["partition"], F.lit(0)).alias("part"),
        op.alias("op"),
        image["conv_id"].alias("conv_id"),
        image["turn_idx"].alias("turn_idx"),
        image["role"].alias("role"),
        image["text"].alias("text"),
        image["tool"].alias("tool"),
        F.lit(None).cast("string").alias("ddl_arg"),
        F.lit(None).cast("map<string,string>").alias("extra"),
    ]
    if multi_table:
        cols.append(p["source"]["table"].alias("table_name"))
    return raw.select(*cols)


def read_debezium(
    spark: SparkSession, path: str, multi_table: bool = False
) -> DataFrame:
    """Batch scan of a directory of Debezium JSON-lines files."""
    return _normalize(spark.read.text(path), multi_table=multi_table)


def read_debezium_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    multi_table: bool = False,
) -> DataFrame:
    """Tail a directory of Debezium JSON-lines files as a file-source
    stream — drop-in for ``read_changelog_stream`` in ``CdcTask`` /
    ``MultiCdcTask`` (pass ``source='debezium'``); checkpointing, pacing,
    and the malformed-event policy are unchanged."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return _normalize(reader.text(path), multi_table=multi_table)


def _image() -> Column:
    return F.struct(*[F.col(n) for n, _t in _IMAGE_FIELDS])


def to_debezium(changelog: DataFrame) -> DataFrame:
    """Changelog rows → one-column ``value`` DataFrame of envelope JSON
    strings (writable with ``df.write.text``). DML ops only — Debezium has
    no DDL-in-stream envelope (schema changes ride its separate history
    topic), so DDL rows must stay on a native changelog."""
    is_del = F.col("op") == S.OP_DELETE
    # cast: unix_micros requires TIMESTAMP; changelogs read from parquet
    # often carry TIMESTAMP_NTZ (session tz is pinned to UTC, so the cast
    # is value-preserving)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    src = [
        F.col("lsn").alias("lsn"),
        ts_us.alias("ts_us"),
        F.col("part").alias("partition"),
    ]
    if "table_name" in changelog.columns:
        src.append(F.col("table_name").alias("table"))
    env = F.struct(
        F.when(is_del, _image()).alias("before"),
        F.when(~is_del, _image()).alias("after"),
        F.struct(*src).alias("source"),
        F.when(F.col("op") == S.OP_INSERT, F.lit("c"))
        .when(F.col("op") == S.OP_UPSERT, F.lit("u"))
        .when(is_del, F.lit("d"))
        .alias("op"),
        (ts_us / 1000).cast("long").alias("ts_ms"),
    )
    return changelog.select(F.to_json(env).alias("value"))
