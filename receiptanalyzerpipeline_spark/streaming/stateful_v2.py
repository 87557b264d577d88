"""Session-gap sessionization on Spark 4's ``transformWithState`` API —
the modern successor to ``applyInPandasWithState`` (streaming/stateful.py),
with explicit typed state and event-time TIMERS instead of a single
timeout per key.

Same semantics as the v1 operator (and the batch lag+cumsum plan q_t3):
events for a key share a session while consecutive event-time gaps stay
under ``gap_seconds``; a session is emitted when a later event closes it,
or when the watermark passes last-event + gap (timer expiry). The fold is
the same interval-merge as v1, so out-of-order events under the watermark
extend a session backwards across micro-batches.

Why both implementations exist: applyInPandasWithState is the widely
deployed API; transformWithState is where Structured Streaming is heading
(typed ValueState/ListState/MapState, multiple timers per key, state TTL,
initial-state bootstrap). Keeping the v2 operator behaviorally identical
to v1 (tests/test_stateful_streaming.py runs the same replay against
both) demonstrates the migration path without betting the pipeline on one
API.

Scale posture is unchanged: state is hash-partitioned by key, one small
fixed-width row per open session, RocksDB-backed state store in
production configs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from receiptanalyzerpipeline_spark.streaming.stateful import SESSION_SCHEMA

_STATE_SCHEMA = "start_us LONG, end_us LONG, n LONG, sum_value DOUBLE"


def _session_row(user_id: int, s: int, e: int, n: int, v: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(s, unit="us")],
            "session_end": [pd.Timestamp(e, unit="us")],
            "n_events": [n],
            "sum_value": [v],
        }
    )


class SessionProcessor(StatefulProcessor):
    """Interval-merge sessionizer with one event-time timer per open
    session (re-registered as the session end advances)."""

    def __init__(self, gap_seconds: int):
        self.gap_us = gap_seconds * 1_000_000
        self.gap_ms = gap_seconds * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.session = handle.getValueState("session", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        intervals: list[tuple[int, int, int, float]] = []
        if self.session.exists():
            old = self.session.get()
            intervals.append((old[0], old[1], old[2], old[3]))
            # The open session's timer moves with its end; drop the old one.
            self.handle.deleteTimer(old[1] // 1000 + self.gap_ms)
        for pdf in rows:
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                intervals.append((ts_us, ts_us, 1, float(value)))
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list[tuple[int, int, int, float]] = []
        for iv in intervals:
            if merged and iv[0] - merged[-1][1] <= self.gap_us:
                s, e, n, v = merged[-1]
                merged[-1] = (s, max(e, iv[1]), n + iv[2], v + iv[3])
            else:
                merged.append(iv)
        closed, cur = merged[:-1], (merged[-1] if merged else None)
        if cur is not None:
            self.session.update(cur)
            # Same clamp as v1 (streaming/stateful.py): out-of-order
            # micro-batches can put the watermark past this session's
            # natural close; register the timer no earlier than
            # watermark+1ms so it fires at the next legal opportunity.
            wm_ms = (
                timerValues.getCurrentWatermarkInMs() if timerValues is not None else -1
            )
            self.handle.registerTimer(max(cur[1] // 1000 + self.gap_ms, wm_ms + 1))
        for s, e, n, v in closed:
            yield _session_row(user_id, s, e, n, v)

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if not self.session.exists():
            return
        s, e, n, v = self.session.get()
        # Only the CURRENT session's timer closes it; a stale timer from a
        # since-extended session expires harmlessly.
        if expiredTimerInfo.getExpiryTimeInMs() >= e // 1000 + self.gap_ms:
            self.session.clear()
            yield _session_row(user_id, s, e, n, v)

    def close(self) -> None:
        pass


def sessionize_stream_v2(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming session summaries (user_id, ts, value) via
    transformWithStateInPandas — behaviorally identical to
    :func:`receiptanalyzerpipeline_spark.streaming.stateful.sessionize_stream`."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
