"""Stateful sessionization (applyInPandasWithState): watermark-final
sessions must match a sequential Python fold over the same events, each
emitted EXACTLY once; state survives across micro-batches; a
late-but-above-watermark event merges into its pending session instead of
splitting an already-emitted one."""

import os
from collections import Counter

from pyspark.sql import functions as F

from milvus_cdc_spark.streaming.sessionize import sessionize

GAP = 600  # seconds


def _expected_sessions(rows, final_wm_sec, gap=GAP):
    """Sequential oracle: per conv, gap-split runs; a session is FINAL
    (emitted) iff the final watermark strictly passed end + gap."""
    by_conv = {}
    for conv, ts in rows:
        by_conv.setdefault(conv, []).append(ts)
    out = Counter()
    for conv, tss in by_conv.items():
        tss.sort()
        runs = [[tss[0], tss[0], 1]]
        for t in tss[1:]:
            if (t - runs[-1][1]).total_seconds() <= gap:
                runs[-1][1] = t
                runs[-1][2] += 1
            else:
                runs.append([t, t, 1])
        for r in runs:
            if r[1].timestamp() + gap < final_wm_sec:
                out[(conv, r[0], r[1], r[2])] += 1
    return out


def _run_stream(spark, tmp_path, src, schema, watermark):
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    out_dir = str(tmp_path / "out")
    q = (
        sessionize(stream, gap_seconds=GAP, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return Counter(
        (r["conv_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    )


def _mk_events(spark):
    # 3 convs x 3 bursts each, bursts separated by > GAP
    rows = []
    base = 1704067200
    for c in range(3):
        for burst in range(3):
            t0 = base + c * 37 + burst * 5000
            for i in range(4 + c):
                rows.append((f"conv_{c}", t0 + i * 60))
    return spark.createDataFrame(rows, "conv_id string, sec long").select(
        "conv_id", F.timestamp_seconds("sec").alias("ts")
    )


def test_sessionize_streaming_matches_fold(spark, tmp_path):
    ev = _mk_events(spark)
    src = str(tmp_path / "src")
    # two files -> two micro-batches -> state must carry across batches
    ev.orderBy("ts").limit(20).coalesce(1).write.parquet(os.path.join(src, "a"))
    rest = ev.subtract(ev.orderBy("ts").limit(20))
    rest.coalesce(1).write.parquet(os.path.join(src, "b"))

    got = _run_stream(spark, tmp_path, src, ev.schema, watermark="1 second")
    max_sec = max(r["ts"].timestamp() for r in ev.collect())
    exp = _expected_sessions(
        [(r["conv_id"], r["ts"]) for r in ev.collect()], final_wm_sec=max_sec - 1
    )
    # watermark-final semantics: exactly the sessions whose horizon the
    # final watermark passed, each exactly once — no duplicates, no
    # partial/overlapping emissions
    assert got == exp, (
        f"missing={exp - got} extra={got - exp} "
        f"dups={[k for k, n in got.items() if n > 1]}"
    )


def test_sessionize_late_event_merges_not_splits(spark, tmp_path):
    """A late (out-of-order, above-watermark) event that belongs to a
    pending session must merge into it — under early gap-emission it would
    surface as an overlapping extra session."""
    base = 1704067200

    def df(rows):
        return spark.createDataFrame(rows, "conv_id string, sec long").select(
            "conv_id", F.timestamp_seconds("sec").alias("ts")
        )

    src = str(tmp_path / "src")
    # batch 1: run [base, base+60] then a gap-closing event at base+2000
    df([("A", base), ("A", base + 60), ("A", base + 2000)]).coalesce(1).write.parquet(
        os.path.join(src, "a")
    )
    # batch 2: late event base+90 (extends the FIRST run) + a clock event
    # advancing the watermark far enough to finalize both A-sessions
    df([("A", base + 90), ("B", base + 9000)]).coalesce(1).write.parquet(
        os.path.join(src, "b")
    )

    schema = df([("x", 0)]).schema
    got = _run_stream(spark, tmp_path, src, schema, watermark="3000 seconds")

    import datetime as dt

    def t(sec):
        return dt.datetime.utcfromtimestamp(sec)

    exp = Counter(
        {
            ("A", t(base), t(base + 90), 3): 1,       # late event merged in
            ("A", t(base + 2000), t(base + 2000), 1): 1,
        }
    )
    assert got == exp, f"missing={exp - got} extra={got - exp}"
