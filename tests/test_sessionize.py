"""Stateful sessionization (applyInPandasWithState): gap-closed sessions
must match a sequential Python fold over the same events; state survives
across micro-batches."""

import os

from pyspark.sql import functions as F

from milvus_cdc_spark.streaming.sessionize import sessionize

GAP = 600  # seconds


def _expected_sessions(rows, gap=GAP):
    """Sequential oracle: per conv, gap-split runs (only CLOSED sessions —
    each conv's last run stays open until timeout)."""
    by_conv = {}
    for conv, ts in rows:
        by_conv.setdefault(conv, []).append(ts)
    out = set()
    for conv, tss in by_conv.items():
        tss.sort()
        runs = [[tss[0], tss[0], 1]]
        for t in tss[1:]:
            if (t - runs[-1][1]).total_seconds() <= gap:
                runs[-1][1] = t
                runs[-1][2] += 1
            else:
                runs.append([t, t, 1])
        for r in runs[:-1]:  # last run not closed by a gap event
            out.add((conv, r[0], r[1], r[2]))
    return out


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
    ev.filter(F.dayofmonth("ts") >= 0).orderBy("ts").limit(20).coalesce(1).write.parquet(
        os.path.join(src, "a")
    )
    rest = ev.subtract(ev.orderBy("ts").limit(20))
    rest.coalesce(1).write.parquet(os.path.join(src, "b"))

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    out_dir = str(tmp_path / "out")
    q = (
        sessionize(stream, gap_seconds=GAP, watermark="1 second")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["conv_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = _expected_sessions([(r["conv_id"], r["ts"]) for r in ev.collect()])
    # every gap-closed session must be emitted exactly once; timeout-closed
    # tails may additionally appear if the watermark advanced far enough
    assert exp <= got or got == exp, f"missing={exp - got} extra={got - exp}"
    missing = exp - got
    assert not missing, f"missing sessions: {missing}"
