"""Concurrent replication tasks (reference stability suite analogue,
/root/reference/tests/stability/test_cdc_stability.py:28-50): two
independent tasks draining two changelogs into two tables in the same
session must not interfere — each converges to its own oracle state."""

import os

from pyspark.sql import functions as F

from milvus_cdc_spark.sources import generate_changelog, write_changelog
from milvus_cdc_spark.streaming.engine import CdcTask


def test_two_tasks_drain_concurrently(spark, tmp_path):
    logs = {}
    for i, seed in enumerate((42, 1337)):
        log = generate_changelog(
            spark, 3000, seed=seed, n_parts=4, n_convs=20, turns_per_conv=5
        )
        path = str(tmp_path / f"log{i}")
        write_changelog(log, path, n_files=2)
        logs[i] = (path, log)

    tasks = []
    for i, (path, _log) in logs.items():
        t = CdcTask(
            spark,
            path,
            str(tmp_path / f"table{i}"),
            str(tmp_path / f"ckpt{i}"),
            max_files_per_trigger=1,
            n_buckets=4,
        )
        t.start(available_now=True)
        tasks.append(t)
    for t in tasks:
        assert t.wait_drained(300)

    from milvus_cdc_spark.oracle import replay

    for i, (_path, log) in logs.items():
        exp_rows, _cols = replay([r.asDict() for r in log.collect()])
        exp = {(r["conv_id"], r["turn_idx"]): r["text"] for r in exp_rows}
        got = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in tasks[i].table.read(spark).collect()
        }
        assert got == exp, f"task {i}: {len(got)} vs {len(exp)}"
