"""Stateful conversation sessionization — the engine's demonstration of a
CUSTOM stateful streaming operator (``applyInPandasWithState``), beyond
what the MERGE pipeline itself needs.

Reference analogue: the ts-manager tracks per-channel event-time progress
and emits aligned ticks when the cross-channel minimum advances
(/root/reference/core/reader/ts_manager.go:103-194); here the same
watermark machinery drives per-conversation session state: a session is a
run of events for one ``conv_id`` with no event-time gap larger than
``gap_seconds``.

Semantics:
- events arriving within ``gap_seconds`` of the current session's end
  extend it;
- an event past the gap CLOSES the current session (emitted immediately
  with that batch) and starts a new one;
- a session with no successor event is closed by EVENT-TIME TIMEOUT once
  the stream's watermark (min event time across partitions, the
  GetMinTS analogue) passes ``session_end + gap`` — late data older than
  the watermark cannot reopen it, which is exactly the reference's
  min-ts alignment guarantee.

State per key is O(1) (start, end, count) — at 10^10 events the state
store holds one tiny row per live conversation, and the shuffle is keyed
by conv_id exactly like the dedup stage.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # 'gap' | 'timeout'
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_US = 1_000_000


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]

        def row(start_us, end_us, n, closed_by):
            return {
                "conv_id": conv_id,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(end_us, unit="us"),
                "n_events": n,
                "closed_by": closed_by,
            }

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame([row(start_us, end_us, n, "timeout")])
            return

        # vectorized per-batch pre-aggregation: sort once, split into
        # gap-separated runs with a cumsum over boolean gap breaks
        ts = (
            pd.concat([p["ts"] for p in pdfs])
            .astype("datetime64[us]")
            .sort_values()
            .astype("int64")
        )
        if len(ts) == 0:
            return
        breaks = (ts.diff() > gap_us).cumsum().fillna(0)
        runs = ts.groupby(breaks).agg(["min", "max", "count"])

        # sweep-merge the batch's runs TOGETHER WITH the stored session as
        # intervals sorted by start: a late (above-watermark) run that
        # precedes the open session must satisfy the gap rule on BOTH
        # sides — naively gluing anything with lo <= session_end + gap
        # would merge arbitrarily-old late data into the session
        intervals = [
            [int(r["min"]), int(r["max"]), int(r["count"])]
            for _, r in runs.iterrows()
        ]
        if state.exists:
            intervals.append(list(state.get))
        intervals.sort()
        out = []
        cur = intervals[0]
        for lo, hi, n in intervals[1:]:
            if lo - cur[1] <= gap_us:
                cur = [cur[0], max(cur[1], hi), cur[2] + n]
            else:
                out.append(row(cur[0], cur[1], cur[2], "gap"))
                cur = [lo, hi, n]
        state.update((cur[0], cur[1], cur[2]))
        # close by timeout once the watermark passes end + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if out:
            yield pd.DataFrame(out)

    return fn


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """events (streaming or batch-test DataFrame with conv_id, ts) →
    append-mode stream of closed sessions."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("conv_id", "ts")
        .filter(F.col("conv_id").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
