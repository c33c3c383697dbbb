"""SparkSession builder with scale-oriented defaults.

Defaults chosen for the 100 TB design point, testable on local[N]:
AQE on (runtime re-plan + skew-join split), shuffle partitions sized to
cores locally (would be 2-3x total cores on a real cluster), Arrow on for
every pandas-UDF boundary.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def _mem_avail_gb() -> int | None:
    try:
        with open("/proc/meminfo") as f:
            m = re.search(r"MemAvailable:\s+(\d+) kB", f.read())
        return int(m.group(1)) // (1024 * 1024) if m else None
    except OSError:
        return None


def _driver_mem_and_opts() -> tuple[str, str]:
    """Heap size + JVM options sized to the host.

    Xms=Xmx + AlwaysPreTouch + THP fault the whole heap in at JVM start
    with 2MB pages. Without this, first-touch page faults during execution
    (GB/s allocation rate x 32 task threads) spin the whole executor pool
    inside kernel memory locks — measured 97% system CPU with all 32 cores
    pegged. But pre-touching unconditionally means a host with less free
    RAM than the default heap fails at JVM start, so: an EXPLICIT
    SPARK_DRIVER_MEM opts in to pre-touch at that size; otherwise the
    default heap is capped at half of MemAvailable and pre-touch is only
    kept when the heap fits in a third of it (lazy commit costs nothing
    until the pages are actually needed)."""
    explicit = os.environ.get("SPARK_DRIVER_MEM")
    avail = _mem_avail_gb()
    if explicit:
        mem, pretouch = explicit, True
    else:
        gb = 16 if avail is None else max(2, min(16, avail // 2))
        mem = f"{gb}g"
        pretouch = avail is not None and gb * 3 <= avail
    opts = "-XX:+UseG1GC -XX:G1HeapRegionSize=16m"
    if pretouch:
        opts += f" -Xms{mem} -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages"
    return mem, opts


def get_spark(
    app_name: str = "milvus_cdc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    mem, jvm_opts = _driver_mem_and_opts()
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the merge join pre-partitions both sides on (_bucket, _wsalt) — a
        # strict subset of its join keys (both are functions of conv_id) —
        # so the join output lands already write-partitioned and the merged
        # rows never re-shuffle (operators/apply.py merge_actions). Default
        # (true) would insert a third full-width Exchange.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions", jvm_opts)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
