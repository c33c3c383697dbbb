from milvus_cdc_spark.sources.changelog_gen import (
    generate_changelog,
    generate_multi_changelog,
    write_changelog,
)
from milvus_cdc_spark.sources.changelog import read_changelog, read_changelog_stream
from milvus_cdc_spark.sources.debezium import (
    read_debezium,
    read_debezium_stream,
    to_debezium,
)

__all__ = [
    "generate_changelog",
    "generate_multi_changelog",
    "write_changelog",
    "read_changelog",
    "read_changelog_stream",
    "read_debezium",
    "read_debezium_stream",
    "to_debezium",
]
