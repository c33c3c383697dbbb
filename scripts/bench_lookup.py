"""Point-lookup pruning benchmark — evidence for the serving path.

Builds a real drained table (10M events by default, 64 buckets), then
measures fetching ONE conversation three ways:

  full    — full-table scan + key filter (what a store without key
            routing has to do)
  lookup  — SnapshotTable.lookup(): driver-side key→bucket routing
            (functions/keyhash) + pushed key filter, pre-compaction
            (multi-epoch unsorted files)
  lookup_sorted — same, after compact() (sorted files: row-group
            min/max stats also prune within the bucket)

Reports wall times (best-of-N), the file-count reduction, and the
routing cost itself (pure Python, no Spark job). At 100 TB the file
ratio IS the read ratio: lookup touches 1/n_buckets of the table
regardless of table size, while `full` grows linearly.

Prints ONE JSON line and writes it to LOOKUP.json at the repo root.
env: SPARK_GRAFT_CPUS (default 32), CDC_BENCH_EVENTS (default 10M),
     LOOKUP_BUCKETS (default 64).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("CDC_BENCH_EVENTS", "10000000"))
    n_buckets = int(os.environ.get("LOOKUP_BUCKETS", "64"))

    from milvus_cdc_spark.functions.keyhash import bucket_of
    from milvus_cdc_spark.plans.manifest import SnapshotTable
    from milvus_cdc_spark.session import _mem_avail_gb, get_spark
    from milvus_cdc_spark.sources import generate_changelog, write_changelog
    from milvus_cdc_spark.streaming.engine import run_until_drained

    avail = _mem_avail_gb()
    if avail is None or avail >= 20:
        os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    spark = get_spark(
        "bench_lookup", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="cdc_lookup_", dir=base)
    log_dir = os.path.join(work, "log")
    write_changelog(
        generate_changelog(
            spark, n_events, n_parts=32, n_convs=max(200, n_events // 500),
            turns_per_conv=50,
        ),
        log_dir,
        n_files=16,
    )
    task = run_until_drained(
        spark, log_dir, os.path.join(work, "table"),
        os.path.join(work, "ckpt"), max_files_per_trigger=8,
        n_buckets=n_buckets,
    )
    table: SnapshotTable = task.table
    m = table.current()
    total_files = sum(len(v) for v in m.files.values())

    def _bytes(rels) -> int:
        return sum(os.path.getsize(os.path.join(table.root, r)) for r in rels)

    total_bytes = sum(_bytes(v) for v in m.files.values())

    # a real mid-table conversation (deterministic: median distinct key)
    convs = [
        r.conv_id
        for r in table.read(spark).select("conv_id").distinct().collect()
    ]
    conv = sorted(convs)[len(convs) // 2]

    # routing cost: pure-Python hash, no Spark job
    t0 = time.perf_counter()
    b = bucket_of(conv, m.n_buckets)
    route_us = (time.perf_counter() - t0) * 1e6
    bucket_files = len(m.files.get(str(b), []))
    bucket_bytes = _bytes(m.files.get(str(b), []))

    def best_of(fn, n=3):
        reps = []
        for _ in range(n):
            t0 = time.time()
            rows = fn()
            reps.append(time.time() - t0)
        return min(reps), len(rows)

    full_sec, n_rows = best_of(
        lambda: table.read(spark).filter(F.col("conv_id") == conv).collect()
    )
    pre_sec, n_pre = best_of(lambda: table.lookup(spark, conv).collect())
    table.compact(spark)  # sorted rewrite
    m2 = table.current()
    sorted_sec, n_sorted = best_of(lambda: table.lookup(spark, conv).collect())
    assert n_rows == n_pre == n_sorted and n_rows > 0, (
        n_rows, n_pre, n_sorted,
    )
    shutil.rmtree(work, ignore_errors=True)

    out = {
        "metric": "point_lookup_wall",
        "unit": "sec",
        "n_events": n_events,
        "n_buckets": n_buckets,
        "conv": conv,
        "n_rows": n_rows,
        "route_usec": round(route_us, 1),
        "total_files": total_files,
        "bucket_files": bucket_files,
        "file_ratio": round(total_files / max(1, bucket_files), 1),
        "total_bytes": total_bytes,
        "bucket_bytes": bucket_bytes,
        # the scale-relevant number: a lookup's read cost is this fraction
        # of the table at ANY table size (wall speedup at 10M rows is
        # bounded by Spark's fixed per-job cost, not by the read)
        "bytes_ratio": round(total_bytes / max(1, bucket_bytes), 1),
        "full_scan_sec": round(full_sec, 3),
        "lookup_sec": round(pre_sec, 3),
        "lookup_sorted_sec": round(sorted_sec, 3),
        "speedup_vs_full": round(full_sec / sorted_sec, 1),
        "sorted_files": sum(len(v) for v in m2.files.values()),
        "cpus": cpus,
    }
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "LOOKUP.json"), "w"
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
