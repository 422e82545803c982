"""Streaming heavy hitters: sharded Misra-Gries summaries via
applyInPandasWithState.

Finds the most frequent values in an unbounded stream with BOUNDED
state — the classic frequent-items sketch (Misra-Gries / Space-
Saving), which stock Structured Streaming cannot express (a
groupBy(user).count() stream keeps O(distinct users) state forever).

State layout: one summary per (group, shard) key holding at most
``capacity`` counters. The shard key spreads a group's traffic over
``n_shards`` independent summaries, so no single state task ingests a
whole group's volume — and Misra-Gries summaries MERGE (counts add;
the merged summary obeys the combined error bound), so the shard
merge is a tiny batch aggregation at read time. That is the 100 TB
shape: per-shard sketches in the stream, one associative merge at
query time.

Error contract (per shard): counter ≤ true count ≤ counter +
decrements, and decrements ≤ n_shard_rows / (capacity + 1) — pinned
by tests/test_streaming.py against exact batch counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

HH_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("shard", LongType()),
        StructField("user_id", LongType()),
        StructField("mg_count", LongType()),
        StructField("shard_rows", LongType()),
        StructField("shard_decrements", LongType()),
        StructField("snapshot_seq", LongType()),
    ]
)

# state: parallel arrays of counter keys/values + scalar totals;
# snapshot_seq increments on every state-fn invocation, so the merge
# can pick each shard's latest snapshot even if the fn ever runs on an
# empty batch (e.g. under a state timeout), where shard_rows would tie
_HH_STATE_SCHEMA = StructType(
    [
        StructField("keys", StringType()),  # comma-joined user ids
        StructField("vals", StringType()),  # comma-joined counts
        StructField("n_rows", LongType()),
        StructField("n_decrements", LongType()),
        StructField("snapshot_seq", LongType()),
    ]
)

DEFAULT_CAPACITY = 64


def _mg_update(
    counters: dict[int, int], batch_counts: pd.Series, capacity: int
) -> int:
    """Fold a batch's value counts into the Misra-Gries summary.

    Returns the number of decrement rounds applied (the error added).
    Processing grouped counts instead of single rows is the standard
    batched MG: add each (value, count); on overflow subtract the
    minimum surviving count from everyone and drop zeros.
    """
    decrements = 0
    for value, cnt in batch_counts.items():
        v = int(value)
        if v in counters or len(counters) < capacity:
            counters[v] = counters.get(v, 0) + int(cnt)
            continue
        # overflow: decrement all by the smaller of (incoming count,
        # current min) until either the incoming value earns a slot
        # or its count is exhausted
        remaining = int(cnt)
        while remaining > 0:
            m = min(counters.values())
            step = min(m, remaining)
            decrements += step
            remaining -= step
            for k in list(counters):
                counters[k] -= step
                if counters[k] == 0:
                    del counters[k]
            if len(counters) < capacity and remaining > 0:
                counters[v] = remaining
                remaining = 0
    return decrements


def _make_hh_fn(capacity: int):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        event_type, shard = key
        if state.exists:
            keys_s, vals_s, n_rows, n_dec, seq = state.get
            counters = (
                dict(
                    zip(
                        (int(x) for x in keys_s.split(",")),
                        (int(x) for x in vals_s.split(",")),
                    )
                )
                if keys_s
                else {}
            )
        else:
            counters, n_rows, n_dec, seq = {}, 0, 0, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_rows += len(pdf)
            n_dec += _mg_update(
                counters, pdf["user_id"].value_counts(), capacity
            )
        seq += 1
        ordered = sorted(counters.items())
        state.update(
            (
                ",".join(str(k) for k, _ in ordered),
                ",".join(str(v) for _, v in ordered),
                n_rows,
                n_dec,
                seq,
            )
        )
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(ordered),
                "shard": [shard] * len(ordered),
                "user_id": [k for k, _ in ordered],
                "mg_count": [v for _, v in ordered],
                "shard_rows": [n_rows] * len(ordered),
                "shard_decrements": [n_dec] * len(ordered),
                "snapshot_seq": [seq] * len(ordered),
            }
        )

    return fn


def streaming_heavy_hitters(
    events: DataFrame,
    n_shards: int = 8,
    capacity: int = DEFAULT_CAPACITY,
) -> DataFrame:
    """Per-(event_type, shard) Misra-Gries summaries, re-emitted each
    micro-batch (output mode "update" — the sink keeps the latest
    summary per key)."""
    sharded = events.withColumn(
        "shard", F.pmod(F.col("user_id"), F.lit(n_shards))
    )
    return sharded.groupBy("event_type", "shard").applyInPandasWithState(
        _make_hh_fn(capacity),
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_shard_summaries(summaries: DataFrame, top_k: int = 5) -> DataFrame:
    """Associative shard merge + top-k: counts add across shards (each
    user lives in exactly one shard here, so the 'merge' is exact
    recombination); rank per group with a deterministic tiebreak.

    An update-mode memory sink APPENDS each batch's snapshot, so the
    merge first keeps only the latest snapshot per shard — identified
    by ``snapshot_seq``, which strictly increases on every state-fn
    invocation (``shard_rows`` alone would tie across snapshots if the
    fn ever ran on an empty batch, e.g. under a state timeout)."""
    from pyspark.sql import Window

    w_latest = Window.partitionBy("event_type", "shard")
    latest = summaries.withColumn(
        "__max_seq", F.max("snapshot_seq").over(w_latest)
    ).filter(F.col("snapshot_seq") == F.col("__max_seq"))
    merged = latest.groupBy("event_type", "user_id").agg(
        F.sum("mg_count").alias("est_count")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("est_count").desc(), F.col("user_id")
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("event_type", "rank", "user_id", "est_count")
    )
