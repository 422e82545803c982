"""Arbitrary stateful streaming via Spark 4's transformWithStateInPandas
(the StatefulProcessor API) — the successor surface to
applyInPandasWithState (stateful.py), kept side by side:

- applyInPandasWithState: one opaque state tuple per key, timeout
  enum — the Spark 3.x surface, used by the sessionizer/heavy-hitter
  operators.
- transformWithState: named, typed, independently-evolvable state
  variables (value/list/map state) managed by a handle, explicit
  timers, and schema evolution support — where new stateful operators
  should land.

The demo processor mirrors stateful.py's running per-key totals so
the two APIs are directly comparable (and test-asserted equal): the
state is a bounded scalar tuple, hash-partitioned by key in the
executor state store — the only state shape that survives 100 TB key
cardinalities.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

def tws_available() -> bool:
    """transformWithState's driver worker speaks protobuf to the JVM
    state server; without the google.protobuf package the worker
    crashes at init (verified: ImportError in
    transform_with_state_driver_worker). Same runtime-detection
    pattern as the Pillow codec seam — the operator runs wherever the
    dependency exists, and callers/tests gate on this probe."""
    try:
        # find_spec on a dotted name imports the parent package, which
        # itself raises when absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum) — ValueState holds two scalars;
    each micro-batch folds its rows in and emits the updated total."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals",
            StructType(
                [
                    StructField("n", LongType()),
                    StructField("total", DoubleType()),
                ]
            ),
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def close(self) -> None:
        pass


def running_totals_tws(events: DataFrame) -> DataFrame:
    """events(user_id, value, ...) stream → updated (user_id,
    n_events, total_value) per key per micro-batch."""
    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
