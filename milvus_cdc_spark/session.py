"""SparkSession builder with scale-oriented defaults.

Defaults chosen for the 100 TB design point, testable on local[N]:
AQE on (runtime re-plan + skew-join split), shuffle partitions sized to
cores locally (would be 2-3x total cores on a real cluster), Arrow on for
every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "milvus_cdc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config(
            "spark.driver.extraJavaOptions",
            # Xms=Xmx + AlwaysPreTouch + THP: fault the whole heap in at
            # JVM start with 2MB pages. Without this, first-touch page
            # faults during execution (GB/s allocation rate x 32 task
            # threads) spin the whole executor pool inside kernel memory
            # locks — measured 97% system CPU with all 32 cores pegged.
            "-XX:+UseG1GC -XX:G1HeapRegionSize=16m "
            + f"-Xms{os.environ.get('SPARK_DRIVER_MEM', '16g')} "
            + "-XX:+AlwaysPreTouch -XX:+UseTransparentHugePages",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
