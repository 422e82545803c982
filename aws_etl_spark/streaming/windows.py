"""Structured Streaming operators (SURVEY.md §2.10).

The reference has no streaming — "incremental" arrival is a daily
Airflow schedule plus an S3KeySensor (etl_aws_vini.py:417,459-468).
Here that becomes first-class Structured Streaming: file sources with
``Trigger.AvailableNow`` (the exact batch-incremental semantics of the
reference's daily run, minus the cron), watermarked event-time windows,
stateful dedup, and sessionization.

Every transformation below is written against a plain DataFrame so the
SAME function serves batch (parquet read) and streaming (readStream)
inputs — the Spark unification the reference's architecture lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamReader


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per-(window, event_type) count + exact-decimal value sum.

    With ``watermark`` set (streaming), late rows beyond the bound are
    dropped and windows finalize incrementally; in batch the same plan
    is a plain group-by.
    """
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window_avg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "2 hours",
    slide: str = "1 hour",
) -> DataFrame:
    return (
        events.groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def watermark_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming dedup: duplicates of a key arriving within
    the watermark horizon are dropped; state is GC'd past it — the
    bounded-state version of dropDuplicates."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def read_events_stream(
    spark, path_glob: str, schema
) -> DataFrame:
    """File-source stream over parquet drops (the reference's
    S3-landing-zone arrival pattern, as a real stream)."""
    reader: DataStreamReader = spark.readStream.format("parquet").schema(schema)
    return reader.option("maxFilesPerTrigger", 1).load(path_glob)


def run_available_now(stream_df: DataFrame, query_name: str) -> None:
    """Process everything currently available, then stop — the
    batch-incremental trigger matching the reference's daily-run
    semantics."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    max_lag: str = "5 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: a right-side event joins
    left-side events of the same key whose timestamp falls in
    [right.ts − max_lag, right.ts] (click-joins-impression shape).

    Both sides are watermarked so the join state is bounded: Spark
    buffers each side only until the other's watermark passes the
    interval bound, then GCs — the only safe way to join two unbounded
    streams. The time-bound predicate is REQUIRED (an unbounded-state
    equi-join on two append streams would otherwise buffer forever).
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        *[c for c in left.columns if c not in (key, ts_col)],
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, ts_col)
        ],
    ).withWatermark("r_ts", watermark)
    return l.join(
        r,
        F.expr(
            f"l_key = r_key AND l_ts BETWEEN r_ts - INTERVAL {max_lag} "
            "AND r_ts"
        ),
    )


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (small)
    static dimension — Spark broadcasts it per batch; no stream state.
    The streaming analogue of the reference's curated dimension joins."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), on, "left")
