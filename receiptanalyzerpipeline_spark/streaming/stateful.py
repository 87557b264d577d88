"""Custom stateful streaming operator: session-gap sessionization with
``applyInPandasWithState`` (SURVEY T6/T7 family; the Spark-native answer
to per-key custom state the reference keeps in its watcher loop,
/root/reference/anarcpt/watcher.py:82-147 — there, an in-process dict;
here, checkpointed distributed state with event-time timeouts).

Semantics: events for a key belong to one session while consecutive
event-time gaps stay under ``gap_seconds``; a session closes when the
watermark passes its last event + gap (timeout), at which point exactly
one summary row is emitted. This matches the batch sessionizer
(plans/events.py q_t3: lag + cumulative-sum) — test_stateful_streaming
proves stream/batch equivalence on replay.

Scale notes (100 TB): state is partitioned by key across executors
(hash shuffle — same cost class as a streaming groupBy), one small dict
per open session, checkpointed via the state store (RocksDB-backed in
production configs). Late events beyond the watermark are dropped by
Spark before reaching the function — the same contract as windowed aggs.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

INPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, sum_value = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [sum_value],
                }
            )
            return

        # Interval-merge fold: the open session from state and every batch
        # event are intervals; sort by start and merge neighbors within the
        # gap. This gives exact parity with the batch sessionizer (lag +
        # cumulative sum over globally sorted events) even when a
        # cross-batch event arrives under the watermark with ts EARLIER
        # than the open session's recorded start — membership is decided
        # against both ends and session_start becomes the min (ADVICE r1).
        gap_us = gap_seconds * 1_000_000
        intervals: list[tuple[int, int, int, float]] = []
        if state.exists:
            intervals.append(tuple(state.get))
        for pdf in pdfs:
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                intervals.append((ts_us, ts_us, 1, float(value)))
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list[tuple[int, int, int, float]] = []
        for iv in intervals:
            if merged and iv[0] - merged[-1][1] <= gap_us:
                s, e, n, v = merged[-1]
                merged[-1] = (s, max(e, iv[1]), n + iv[2], v + iv[3])
            else:
                merged.append(iv)
        closed, cur = merged[:-1], (merged[-1] if merged else None)
        if cur is not None:
            state.update(cur)
            # Close when the watermark passes session end + gap. The
            # natural close time can already be BEHIND the watermark —
            # micro-batch file order is not guaranteed, so another key's
            # later events may have driven the watermark past this key's
            # whole session before its events arrive (arbitrary-state ops
            # receive late rows; Spark only pre-drops them for built-in
            # aggregations). setTimeoutTimestamp rejects past timestamps,
            # so clamp to watermark+1ms: the session then times out in
            # the next batch — the earliest moment it can legally close.
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(cur[1] // 1000 + gap_ms, wm_ms + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in closed],
                    "n_events": [n for _, _, n, _ in closed],
                    "sum_value": [v for _, _, _, v in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming session summaries from an event stream with columns
    (user_id, ts, value). One output row per closed session; sessions
    close via event-time timeout once the watermark passes last-event+gap.

    Events are folded by interval-merging (state ∪ batch events, sorted,
    neighbors within the gap merged), so disorder under the watermark is
    tolerated both within a micro-batch and across batches: an event older
    than the open session's start extends it backwards (start = min),
    exactly as the batch sessionizer over globally sorted events would.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
