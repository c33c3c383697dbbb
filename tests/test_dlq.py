"""Dead-letter handling for poison events: DML rows missing their key or
ordering identity (conv_id/turn_idx/lsn/ts) and DDL rows whose ddl_arg
doesn't parse. Default is fail-before-commit (the reference's
pause-on-error stance, server/cdc_impl.go:972-1003 — a task pauses with
the reason rather than writing garbage); ``on_malformed='dlq'``
quarantines them to <table>/dlq/epoch-N/ with a _reason column and
applies the rest (the Kafka-Connect/Debezium DLQ pattern)."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark import schemas as S
from milvus_cdc_spark.operators.apply import apply_batch
from milvus_cdc_spark.oracle import replay
from milvus_cdc_spark.plans.manifest import SnapshotTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, S.CHANGELOG_SCHEMA)


def _ev(lsn, conv, turn, text, sec, op="INSERT", part=0, ddl_arg=None,
        ts=True):
    role = "user" if op in S.DML_OPS and op != S.OP_DELETE else None
    return (lsn, datetime(2024, 1, 1, 0, 0, sec) if ts else None, part, op,
            conv, turn, role, text, None, ddl_arg, None)


def _tbl(spark, tmp_path, write_mode="cow"):
    t = SnapshotTable(str(tmp_path / "t"))
    t.create(S.TRANSCRIPTS_BASE_COLUMNS, n_buckets=4, write_mode=write_mode)
    return t


def _state(spark, t):
    return {
        (r.conv_id, r.turn_idx, r.text)
        for r in t.read(spark).select("conv_id", "turn_idx", "text").collect()
    }


def test_default_fails_loudly_on_null_key(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    batch = _mk(spark, [
        _ev(1, "c1", 1, "good", 1),
        _ev(2, None, 1, "poison", 1),   # null conv_id
    ])
    with pytest.raises(ValueError, match="malformed"):
        apply_batch(spark, t, batch, 0)
    # nothing committed: the epoch is still applicable
    assert "0" not in t.current().epochs


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
def test_dlq_quarantines_and_applies_rest(spark, tmp_path, write_mode):
    t = _tbl(spark, tmp_path, write_mode)
    clean = [
        _ev(1, "c1", 1, "one", 1),
        _ev(5, "c2", 1, "two", 2),
    ]
    poison = [
        _ev(2, None, 1, "p1", 1),                 # null conv_id
        _ev(3, "c9", None, "p2", 1),              # null turn_idx
        _ev(4, "c8", 1, "p3", 1),                 # ts nullified below
    ]
    batch = _mk(spark, clean + poison).withColumn(
        "ts", F.when(F.col("lsn") != 4, F.col("ts"))  # null ts for lsn 4
    )
    res = apply_batch(spark, t, batch, 0, on_malformed="dlq")
    assert res["n_dlq"] == 3
    assert res["n_events"] == 2
    want_rows, _cols = replay([r.asDict() for r in _mk(spark, clean).collect()])
    assert _state(spark, t) == {
        (r["conv_id"], r["turn_idx"], r["text"]) for r in want_rows
    }
    dlq = spark.read.parquet(str(tmp_path / "t" / "dlq" / "epoch-0"))
    got = {(r.lsn, r._reason) for r in dlq.select("lsn", "_reason").collect()}
    assert got == {
        (2, "null key (conv_id/turn_idx)"),
        (3, "null key (conv_id/turn_idx)"),
        (4, "null ts"),
    }
    # quarantine counter lands in the snapshot summary
    assert t.current().summary.get("events_quarantined") == 3
    # replaying the committed epoch is still a no-op
    assert apply_batch(spark, t, _mk(spark, clean + poison), 0,
                       on_malformed="dlq").get("skipped")


def test_bad_ddl_arg_fails_by_default_with_context(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    batch = _mk(spark, [
        _ev(1, "c1", 1, "one", 1),
        _ev(2, None, None, None, 2, op=S.OP_ADD_COLUMN, ddl_arg="{not json"),
    ])
    with pytest.raises(ValueError, match="bad DDL.*parse error"):
        apply_batch(spark, t, batch, 0)


def test_bad_ddl_quarantined_good_ddl_applies(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    batch = _mk(spark, [
        _ev(1, "c1", 1, "one", 1),
        # missing required 'column' key
        _ev(2, None, None, None, 2, op=S.OP_ADD_COLUMN, ddl_arg="{}"),
        # unparseable
        _ev(3, None, None, None, 2, op=S.OP_RENAME_COLUMN, ddl_arg="]["),
        # good DDL in the same batch still lands
        _ev(4, None, None, None, 2, op=S.OP_ADD_COLUMN,
            ddl_arg='{"column": "tool_rc", "type": "int"}'),
    ])
    res = apply_batch(spark, t, batch, 0, on_malformed="dlq")
    assert res["n_dlq"] == 2
    assert res["n_ddl"] == 1
    assert "tool_rc" in [c for c, _t in t.current().columns]
    dlq = spark.read.parquet(
        str(tmp_path / "t" / "dlq" / "epoch-0" / "bad-ddl.parquet")
    )
    reasons = {r.lsn: r._reason for r in dlq.collect()}
    assert set(reasons) == {2, 3}
    assert "parse error" in reasons[3]
    assert "invalid ddl args" in reasons[2]


def test_dlq_does_not_break_lsn_gate(spark, tmp_path):
    """Quarantined rows leave the duplicate-lsn integrity gate intact:
    a genuine duplicate among the CLEAN rows still kills the epoch."""
    t = _tbl(spark, tmp_path)
    batch = _mk(spark, [
        _ev(1, "c1", 1, "one", 1),
        _ev(1, "c2", 1, "dup", 1),     # duplicate lsn
        _ev(2, None, 1, "p", 1),       # quarantined
    ])
    with pytest.raises(ValueError, match="duplicate lsn"):
        apply_batch(spark, t, batch, 0, on_malformed="dlq")


def test_streaming_drain_with_dlq(spark, tmp_path):
    """A poison file in the log: with on_malformed='dlq' the drain
    completes and the clean rows land; the default drain pauses."""
    from milvus_cdc_spark.streaming.engine import CdcTask, FailProtect

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    _mk(spark, [_ev(1, "c1", 1, "one", 1)]).coalesce(1).write.mode(
        "overwrite").parquet(str(log_dir / "f0"))
    _mk(spark, [
        _ev(2, "c2", 1, "two", 2),
        _ev(3, None, 1, "poison", 2),
    ]).coalesce(1).write.mode("overwrite").parquet(str(log_dir / "f1"))
    # flatten: the stream reads a directory of parquet part-files
    import shutil
    files = []
    for sub in ("f0", "f1"):
        for f in os.listdir(log_dir / sub):
            if f.endswith(".parquet"):
                dst = log_dir / f"{sub}.parquet"
                shutil.move(str(log_dir / sub / f), str(dst))
                files.append(dst)
        shutil.rmtree(log_dir / sub)

    failing = CdcTask(spark, str(log_dir), str(tmp_path / "t_fail"),
                      str(tmp_path / "ck_fail"), max_files_per_trigger=1)
    assert not failing.drain_protected(
        FailProtect(max_failures=2, backoff_sec=0.05), timeout_sec=120
    )
    # the reason carries the trip; the full 'malformed' ValueError text
    # sits past the persisted reason's 400-char truncation (the Java
    # stream-failure wrapper prefixes it), so pin the trip + last_error
    assert "fail-protect tripped" in failing.status()["reason"]
    assert "malformed" in (failing.last_error or "")

    task = CdcTask(spark, str(log_dir), str(tmp_path / "t"),
                   str(tmp_path / "ck"), max_files_per_trigger=1,
                   on_malformed="dlq")
    assert task.drain_protected(FailProtect(), timeout_sec=120)
    assert _state(spark, task.table) == {("c1", 1, "one"), ("c2", 1, "two")}
    dlq_root = tmp_path / "t" / "dlq"
    assert dlq_root.is_dir() and any(dlq_root.iterdir())


def test_dlq_cli_inspect_repair_replay_loop(spark, tmp_path, capsys):
    """The full DLQ reprocess loop through the CLI verb: drain a poisoned
    log with quarantine on → `dlq` summarizes per-epoch reasons → repair
    the quarantined parquet in place → `dlq --replay-to` moves it back
    into the log (and purges) → a second drain lands the repaired row.
    A row left broken simply re-quarantines — replay can never corrupt."""
    import json as _json

    import pyarrow.parquet as _pq

    from milvus_cdc_spark.streaming.cli import main as cli_main
    from milvus_cdc_spark.streaming.engine import CdcTask, FailProtect

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    _mk(spark, [
        _ev(1, "c1", 1, "one", 1),
        _ev(2, None, 1, "lost-key", 2),    # repairable poison
        _ev(3, "c3", 1, "bad-ts", 3),      # ts nullified below: left broken
    ]).withColumn(
        "ts", F.when(F.col("lsn") != 3, F.col("ts"))
    ).coalesce(1).write.mode("overwrite").parquet(str(log_dir / "seed"))
    # flatten the epoch dir into loose files the file-source tails
    import shutil as _sh
    for f in os.listdir(log_dir / "seed"):
        if f.endswith(".parquet"):
            _sh.move(str(log_dir / "seed" / f), str(log_dir / "seed.parquet"))
    _sh.rmtree(log_dir / "seed")

    troot = str(tmp_path / "t")
    task = CdcTask(spark, str(log_dir), troot, str(tmp_path / "ck"),
                   on_malformed="dlq")
    assert task.drain_protected(FailProtect(), timeout_sec=120)
    assert _state(spark, task.table) == {("c1", 1, "one")}

    # inspect
    assert cli_main(["dlq", "--table", troot]) == 0
    summary = _json.loads(capsys.readouterr().out)["t"]["summary"]
    (epoch_dir,) = summary.keys()
    assert summary[epoch_dir] == {
        "null key (conv_id/turn_idx)": 1, "null ts": 1,
    }

    # repair lsn 2 in place (fill the missing key); leave lsn 3 broken
    dlq_epoch = os.path.join(troot, "dlq", epoch_dir)
    for fn in os.listdir(dlq_epoch):
        if not fn.endswith(".parquet") or fn.startswith("."):
            continue  # skip Spark's _SUCCESS / .crc sidecars
        path = os.path.join(dlq_epoch, fn)
        tbl = _pq.read_table(path)
        d = tbl.to_pylist()
        for row in d:
            if row["lsn"] == 2:
                row["conv_id"] = "c2"
        import pyarrow as _pa
        _pq.write_table(_pa.Table.from_pylist(d, schema=tbl.schema), path)

    # replay into the live log (purges the dlq dir)
    assert cli_main(["dlq", "--table", troot, "--replay-to",
                     str(log_dir)]) == 0
    rep = _json.loads(capsys.readouterr().out)["t"]
    assert rep["replay"] == {"replayed_rows": 2, "files_written": 1}
    assert not os.path.isdir(os.path.join(troot, "dlq"))

    # second drain: repaired row lands, broken row re-quarantines
    task2 = CdcTask(spark, str(log_dir), troot, str(tmp_path / "ck"),
                    on_malformed="dlq")
    assert task2.drain_protected(FailProtect(), timeout_sec=120)
    assert _state(spark, task2.table) == {("c1", 1, "one"), ("c2", 1, "lost-key")}
    assert cli_main(["dlq", "--table", troot]) == 0
    re_summary = _json.loads(capsys.readouterr().out)["t"]["summary"]
    assert sum(sum(c.values()) for c in re_summary.values()) == 1

    # purge closes the loop
    assert cli_main(["dlq", "--table", troot, "--purge"]) == 0
    purged = _json.loads(capsys.readouterr().out)["t"]["purge"]
    assert purged["purged_files"] == 1
    assert not os.path.isdir(os.path.join(troot, "dlq"))


def test_multi_null_table_name_fails_or_quarantines(spark, tmp_path, capsys):
    """Unroutable events (null table_name) in a multi-collection batch:
    default raises before any per-table apply commits; dlq mode lands them
    in the TASK-level <tables_root>/_dlq and routes the rest — including
    when an include-filter is set (isin(NULL) would otherwise silently
    drop them at the predicate)."""
    import json as _json

    from milvus_cdc_spark import schemas as S
    from milvus_cdc_spark.streaming.cli import main as cli_main
    from milvus_cdc_spark.streaming.engine import MultiCdcTask

    rows = [
        (1, datetime(2024, 1, 1), 0, "INSERT", "c1", 1, "user", "a",
         None, None, None, "ta"),
        (2, datetime(2024, 1, 1), 0, "INSERT", "c2", 1, "user", "b",
         None, None, None, None),  # null table_name
    ]
    df = spark.createDataFrame(rows, S.MULTI_CHANGELOG_SCHEMA)
    root = str(tmp_path / "tables")

    failing = MultiCdcTask(spark, str(tmp_path / "log"), root,
                           str(tmp_path / "ck1"), collections=["ta"])
    with pytest.raises(ValueError, match="null table_name"):
        failing.apply_multi(df, 0)
    assert not os.path.exists(os.path.join(root, "ta"))  # nothing committed

    task = MultiCdcTask(spark, str(tmp_path / "log"), root,
                        str(tmp_path / "ck2"), collections=["ta"],
                        on_malformed="dlq")
    task.apply_multi(df, 0)
    assert _state(spark, SnapshotTable(os.path.join(root, "ta"))) == {
        ("c1", 1, "a")
    }
    q = spark.read.parquet(os.path.join(root, "_dlq", "epoch-0"))
    got = [(r.lsn, r.table_name, r._reason) for r in q.collect()]
    assert got == [(2, None, "null table_name")]

    # the dlq verb surfaces the task-level _dlq alongside per-table ones
    assert cli_main([
        "dlq", "--tables-root", root, "--log", str(tmp_path / "log"),
        "--checkpoint", str(tmp_path / "ck2"),
    ]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["(task)"]["summary"] == {"epoch-0": {"null table_name": 1}}
    assert "ta" in out
