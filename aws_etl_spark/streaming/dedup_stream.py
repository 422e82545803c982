"""Streaming document dedup: drop exact-content duplicates as they
arrive, with bounded state.

The batch dedup family (aws_etl_spark.dedup) assumes the corpus is at
rest; an ingest pipeline wants the same guarantee ON ARRIVAL — a
document whose content was already seen within the state horizon is
dropped before it ever lands. Composition:

1. fingerprint = md5(lower(trim(text))) — the same content-digest
   convention as the batch ``dedup_exact`` operator, a narrow map;
2. ``dropDuplicatesWithinWatermark([fingerprint])`` — Spark keeps one
   state row per distinct fingerprint and GCs it once the watermark
   passes, so state is bounded by (arrival rate × horizon), not by
   corpus size. An exact-dedup horizon of hours catches the dominant
   real-world case (recrawls / republications arrive close together);
   the full-corpus guarantee remains the batch operator's job.

At 100 TB-scale ingest the state store shards by fingerprint hash
across executors (Spark's stateful-operator partitioning), so the
filter scales horizontally with no coordination beyond the state
shuffle. Tested batch-equivalent in tests/test_corpus.py (stream
output == batch dropDuplicates over the same arrivals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_fingerprint(text: Column) -> Column:
    """md5 digest of whitespace-trimmed, case-folded content — the
    shared convention with the batch exact-dedup path."""
    return F.md5(F.lower(F.trim(text)))


def dedup_documents_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First arrival per distinct content fingerprint survives;
    duplicates within the watermark horizon are dropped, state GC'd
    past it. ``docs`` is a streaming DataFrame with an event-time
    column."""
    return (
        docs.withColumn("fp", content_fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
