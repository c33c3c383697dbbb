from milvus_cdc_spark.sources.changelog_gen import (
    generate_changelog,
    generate_multi_changelog,
    write_changelog,
)
from milvus_cdc_spark.sources.changelog import read_changelog, read_changelog_stream

__all__ = [
    "generate_changelog",
    "generate_multi_changelog",
    "write_changelog",
    "read_changelog",
    "read_changelog_stream",
]
