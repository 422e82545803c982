"""Custom stateful streaming operators via applyInPandasWithState.

This is the extension point for operators Structured Streaming lacks
natively (SURVEY.md §2.10 Gap): arbitrary per-key state carried across
micro-batches, with processing-time timeouts to expire idle keys. The
reference has nothing stateful at all — its "state" is Airflow XCom
between daily runs (etl_aws_vini.py:299,358).

Scale shape: state lives in the executor state store partitioned by
key (same hash partitioning as a groupBy) — per-key state must stay
small and bounded (here: a handful of scalars), never a buffered list
of events.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_event_type", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_type", StringType()),
    ]
)


def _running_totals_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events into (count, value-total) state
    and emit the updated running totals for the key."""
    (user_id,) = key
    n, total, last_type = (
        state.get if state.exists else (0, 0.0, None)
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ordered = pdf.sort_values(["ts", "event_id"])
        n += len(ordered)
        total += float(ordered["value"].sum())
        last_type = str(ordered["event_type"].iloc[-1])
    state.update((n, total, last_type))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_event_type": [last_type],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count / value total across micro-batches.

    Emits one updated row per user per micro-batch (output mode
    "update"). State: three scalars per user — O(users), not O(events).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),  # epoch micros
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30 min, matches batch session_rollup


def _session_close_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-based sessionizer with EVENT-TIME timeout: emits a session
    row only when it CLOSES — either a later event arrives past the
    gap, or the watermark passes last_event + gap (timeout). State is
    four scalars per open session, never buffered events."""
    (user_id,) = key

    def row(start_us: int, last_us: int, n: int, total: float) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [start_us],
                "session_end": [last_us],
                "n_events": [n],
                "total_value": [total],
            }
        )

    if state.hasTimedOut:
        start_us, last_us, n, total = state.get
        state.remove()
        yield row(start_us, last_us, n, total)
        return

    start_us, last_us, n, total = (
        state.get if state.exists else (None, None, 0, 0.0)
    )
    closed: list[pd.DataFrame] = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ordered = pdf.sort_values(["ts", "event_id"])
        for ts, value in zip(ordered["ts"], ordered["value"]):
            ts_us = int(ts.value) // 1_000  # pandas ns → micros
            if start_us is None:
                start_us, last_us, n, total = ts_us, ts_us, 1, float(value)
            elif ts_us - last_us > _GAP_US:
                closed.append(row(start_us, last_us, n, total))
                start_us, last_us, n, total = ts_us, ts_us, 1, float(value)
            else:
                last_us, n, total = ts_us, n + 1, total + float(value)
    state.update((start_us, last_us, n, total))
    # close via watermark: timeout fires once event time passes
    # last_event + gap (setTimeoutTimestamp takes epoch millis)
    state.setTimeoutTimestamp(last_us // 1_000 + _GAP_US // 1_000)
    yield from closed


def closed_sessions(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming gap-sessionization that emits each session exactly
    once, when it closes (in-batch gap or event-time timeout). The
    batch equivalent is sessions.session_rollup — the cross-validation
    test drives both over the same files.

    100 TB shape: state is O(open sessions) scalars, hash-partitioned
    by user; watermark bounds state lifetime; no per-event buffering.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_close_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
