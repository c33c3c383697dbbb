"""Stateful conversation sessionization — the engine's demonstration of a
CUSTOM stateful streaming operator (``applyInPandasWithState``), beyond
what the MERGE pipeline itself needs.

Reference analogue: the ts-manager tracks per-channel event-time progress
and emits aligned ticks when the cross-channel minimum advances
(/root/reference/core/reader/ts_manager.go:103-194); here the same
watermark machinery drives per-conversation session state: a session is a
run of events for one ``conv_id`` with no event-time gap larger than
``gap_seconds``.

Semantics (all emission is WATERMARK-GATED):
- events arriving within ``gap_seconds`` of a pending session extend it;
- a session is emitted only once the stream's watermark (min event time
  across partitions, the GetMinTS analogue) strictly passes
  ``session_end + gap`` — at that point no acceptable (above-watermark)
  event can extend it, so an emitted session is FINAL: late-but-above-
  watermark data cannot split or reopen it (it necessarily starts a new
  session). Gap-closed sessions therefore wait in state alongside the
  open tail until their horizon passes; ``closed_by`` records whether a
  successor run existed ('gap') or the session was the conversation's
  tail when its horizon expired ('timeout').
- data older than the watermark is dropped by Spark before it reaches the
  operator (standard stateful-streaming late-data rule).

State per key is O(#pending sessions) — bounded by (watermark delay /
gap) + 1, typically one or two tiny interval rows per live conversation;
at 10^10 events the state store still holds a few longs per conversation,
and the shuffle is keyed by conv_id exactly like the dedup stage.
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

# pending sessions as parallel arrays, oldest first
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts_us", T.ArrayType(T.LongType())),
        T.StructField("ends_us", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
    ]
)

_US = 1_000_000


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000

        def row(start_us, end_us, n, closed_by):
            return {
                "conv_id": conv_id,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(end_us, unit="us"),
                "n_events": n,
                "closed_by": closed_by,
            }

        # gather intervals: stored pending sessions + this batch's runs
        intervals: list[list[int]] = []
        if state.exists:
            starts, ends, ns = state.get
            intervals = [list(t) for t in zip(starts, ends, ns)]
        if not state.hasTimedOut:
            # vectorized per-batch pre-aggregation: sort once, split into
            # gap-separated runs with a cumsum over boolean gap breaks
            ts = (
                pd.concat([p["ts"] for p in pdfs])
                .astype("datetime64[us]")
                .sort_values()
                .astype("int64")
            )
            if len(ts):
                breaks = (ts.diff() > gap_us).cumsum().fillna(0)
                runs = ts.groupby(breaks).agg(["min", "max", "count"])
                intervals += [
                    [int(r["min"]), int(r["max"]), int(r["count"])]
                    for _, r in runs.iterrows()
                ]
        if not intervals:
            if state.exists:
                state.remove()
            return

        # sweep-merge as intervals sorted by start: a late (above-
        # watermark) run must satisfy the gap rule on BOTH sides — naively
        # gluing anything with lo <= end + gap would merge arbitrarily-old
        # late data into a newer session
        intervals.sort()
        merged = [intervals[0]]
        for lo, hi, n in intervals[1:]:
            if lo - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], hi)
                merged[-1][2] += n
            else:
                merged.append([lo, hi, n])

        # emit only sessions whose horizon the watermark strictly passed:
        # an event at ts == end + gap would still extend, so strict <
        out = []
        pending = []
        for i, (lo, hi, n) in enumerate(merged):
            if hi + gap_us < wm_us:
                out.append(row(lo, hi, n, "gap" if i + 1 < len(merged) else "timeout"))
            else:
                pending.append([lo, hi, n])
        if pending:
            state.update(
                (
                    [p[0] for p in pending],
                    [p[1] for p in pending],
                    [p[2] for p in pending],
                )
            )
            # wake when the earliest pending horizon expires; a horizon
            # exactly AT the watermark (held by the strict-< rule) must be
            # armed strictly above it or Spark rejects the timestamp
            state.setTimeoutTimestamp(
                max((pending[0][1] + gap_us) // 1000, wm_us // 1000 + 1)
            )
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return fn


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """STREAMING events (conv_id, ts) → append-mode stream of FINAL
    (watermark-closed) sessions. Emission is gated on the event-time
    watermark, which only advances in a streaming query — for the batch
    twin of this operator see ``cdc_sessions_batch`` in __spark_entry__.py
    (a pure window/gap-fill aggregation over the same semantics)."""
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
