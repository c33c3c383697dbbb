"""Task CLI — create / drain / status / compact, packaged for spark-submit.

The analogue of the reference's HTTP task API (create/pause/resume/get,
/root/reference/server/cdc_api.go:26-36, doc/cdc-usage.md:104-132) as a
driver-side command:

    spark-submit --py-files milvus_cdc_spark.zip -m milvus_cdc_spark.streaming.cli \
        drain --log /data/changelog --table /lake/transcripts --checkpoint /ckpt/t1

(locally: ``python -m milvus_cdc_spark.streaming.cli ...``)
"""

from __future__ import annotations

import argparse
import json
import sys

from milvus_cdc_spark.session import get_spark
from milvus_cdc_spark.streaming.engine import CdcTask, run_until_drained


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="milvus_cdc_spark")
    p.add_argument(
        "command", choices=["create", "drain", "status", "tail", "compact", "vacuum"]
    )
    p.add_argument("--log", help="changelog directory (task commands)")
    p.add_argument("--table", required=True, help="target SnapshotTable root")
    p.add_argument("--checkpoint", help="streaming checkpoint dir (task commands)")
    p.add_argument("--master", default=None)
    p.add_argument("--max-files-per-trigger", type=int, default=4)
    p.add_argument("--salt", type=int, default=None)
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument("--duration-sec", type=float, default=60.0, help="tail runtime")
    a = p.parse_args(argv)

    if a.command == "vacuum":
        # pure filesystem maintenance — no Spark session needed
        from milvus_cdc_spark.plans.manifest import SnapshotTable

        print(json.dumps(SnapshotTable(a.table).vacuum()))
        return 0
    if a.command in ("create", "drain", "status", "tail") and not (
        a.log and a.checkpoint
    ):
        p.error(f"--log and --checkpoint are required for '{a.command}'")

    spark = get_spark("milvus_cdc_spark_cli", master=a.master)
    kw = dict(
        max_files_per_trigger=a.max_files_per_trigger,
        salt_partitions=a.salt,
        n_buckets=a.n_buckets,
    )
    if a.command == "create":
        task = CdcTask(spark, a.log, a.table, a.checkpoint, **kw)
        print(json.dumps(task.status()))
    elif a.command == "drain":
        task = run_until_drained(spark, a.log, a.table, a.checkpoint, **kw)
        print(json.dumps(task.status()))
    elif a.command == "tail":
        task = CdcTask(spark, a.log, a.table, a.checkpoint, **kw)
        task.start()
        task.query.awaitTermination(a.duration_sec)
        task.pause()
        print(json.dumps(task.status()))
    elif a.command == "status":
        task = CdcTask(spark, a.log, a.table, a.checkpoint, **kw)
        print(json.dumps(task.status()))
    elif a.command == "compact":
        from milvus_cdc_spark.plans.manifest import SnapshotTable

        m = SnapshotTable(a.table).compact(spark)
        print(json.dumps({"version": m.version, "snapshot_id": m.snapshot_id,
                          "n_files": sum(len(v) for v in m.files.values())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
