"""Multi-collection task: one multiplexed changelog → N SnapshotTables,
each matching its own sequential oracle; wildcard/exclude should-read
filter enforced at engine level (reference server/cdc_impl.go:1195-1208).
"""

import os

from pyspark.sql import functions as F

from milvus_cdc_spark.oracle import replay
from milvus_cdc_spark.plans.manifest import SnapshotTable
from milvus_cdc_spark.sources import generate_multi_changelog, write_changelog
from milvus_cdc_spark.streaming.engine import CollectionFilter, MultiCdcTask

N = 3000
TABLES = ["convs_a", "convs_b", "convs_c"]


def _write_log(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    df = generate_multi_changelog(
        spark, N, TABLES, n_parts=4, n_convs=30, turns_per_conv=15, num_partitions=8
    )
    write_changelog(df, log_dir, n_files=6)
    return log_dir


def _oracle_rows(spark, log_dir, name):
    rows = [
        r.asDict()
        for r in spark.read.parquet(log_dir)
        .filter(F.col("table_name") == name)
        .drop("table_name")
        .collect()
    ]
    got, cols = replay(rows)
    scols = sorted(cols)
    return sorted(tuple(r[c] for c in scols) for r in got)


def _table_rows(spark, root, name):
    df = SnapshotTable(os.path.join(root, name)).read(spark)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_two_table_drain_matches_independent_oracles(spark, tmp_path):
    log_dir = _write_log(spark, tmp_path)
    root = str(tmp_path / "tables")
    task = MultiCdcTask(
        spark, log_dir, root, str(tmp_path / "ckpt"),
        collections=["convs_a", "convs_b"],  # convs_c not subscribed
        max_files_per_trigger=2,
    )
    task.start(available_now=True)
    assert task.wait_drained()
    for name in ("convs_a", "convs_b"):
        assert _table_rows(spark, root, name) == _oracle_rows(spark, log_dir, name), name
    assert not os.path.exists(os.path.join(root, "convs_c"))


def test_wildcard_minus_excludes(spark, tmp_path):
    log_dir = _write_log(spark, tmp_path)
    root = str(tmp_path / "tables")
    task = MultiCdcTask(
        spark, log_dir, root, str(tmp_path / "ckpt"),
        collections=None, excludes=["convs_b"],  # '*' minus convs_b
        max_files_per_trigger=3,
    )
    task.start(available_now=True)
    assert task.wait_drained()
    for name in ("convs_a", "convs_c"):
        assert _table_rows(spark, root, name) == _oracle_rows(spark, log_dir, name), name
    assert not os.path.exists(os.path.join(root, "convs_b"))


def test_collection_filter_semantics():
    f = CollectionFilter(None, ["x"])
    assert f.should_read("y") and not f.should_read("x")
    g = CollectionFilter(["a", "b"], ["b"])
    assert g.should_read("a") and not g.should_read("b") and not g.should_read("c")
