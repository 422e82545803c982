"""Surrogate-key generation — the warehouse-load primitive the
reference's Redshift DDL implies but never generates (its curated table
has no synthetic key; etl_aws_vini.py:205-242).

Three tiers, by cost:

- :func:`with_sparse_ids` — ``monotonically_increasing_id``: unique,
  64-bit, NOT contiguous (partition id in the high bits). Zero cost;
  use whenever "unique" is all that's required.
- :func:`with_contiguous_ids` — 0..n−1 without a global sort: count
  rows per partition (tiny aggregate), broadcast the cumulative
  offsets back, add within-partition row numbers. Two passes over the
  data, NO shuffle of the data itself — the scale-safe way to get
  dense ids.
- :func:`with_ordered_ids` — row_number over an explicit global
  ordering. Deterministic and oracle-able, but the global sort is a
  range-partitioned shuffle — reserve for when the ORDER is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_sparse_ids(df: DataFrame, name: str = "sk") -> DataFrame:
    return df.withColumn(name, F.monotonically_increasing_id())


def declared_single_partition(df: DataFrame) -> DataFrame:
    """Funnel a BOUNDED df into one explicitly-declared window
    partition: repartition(1) plus a materialized partition-id column
    ``__g`` to use as partitionBy key. ``partitionBy(lit(1))`` gets
    folded out of the window spec by FoldablePropagation and WindowExec
    then warns about an undefined partition; a materialized
    spark_partition_id() cannot fold, so the single-partition choice
    is declared, not accidental. Callers must guarantee the input is
    bounded (partition counts, distinct dictionary values, ...)."""
    return df.repartition(1).withColumn("__g", F.spark_partition_id())


def _offsets_by_pid(counts: DataFrame) -> DataFrame:
    """Cumulative row offsets per partition id. The window input is one
    row PER PARTITION (bounded by the partition count, never by data
    volume) — a declared single-partition window."""
    return (
        declared_single_partition(counts)
        .withColumn(
            "__off",
            F.sum("__cnt").over(
                Window.partitionBy("__g")
                .orderBy("__pid")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("__pid", F.coalesce("__off", F.lit(0)).alias("__off"))
    )


def with_contiguous_ids(df: DataFrame, name: str = "sk") -> DataFrame:
    """Dense 0..n−1 ids, no data shuffle. Ids are assigned in
    (partition, arrival) order — unique and contiguous, but not tied
    to any column ordering; use :func:`with_ordered_ids` when a
    deterministic order matters."""
    part = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy("__pid").orderBy("__mid")
    return (
        part.join(F.broadcast(_offsets_by_pid(counts)), "__pid")
        .withColumn(name, F.col("__off") + F.row_number().over(w) - 1)
        .drop("__pid", "__mid", "__off")
    )


def with_ordered_ids(
    df: DataFrame, order_by: list[str], name: str = "sk"
) -> DataFrame:
    """1..n ids in the order of ``order_by`` (must be a unique key for
    determinism).

    Distributed shape: range-partition on the order key (parallel
    sort), count rows per partition (tiny agg), broadcast cumulative
    offsets back, add within-partition row numbers. The global
    ordering costs one range shuffle but never funnels the data
    through a single window partition — ids are independent of the
    sampled range boundaries because the order key is unique."""
    cols = [F.col(c) for c in order_by]
    part = df.repartitionByRange(*cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        part.join(F.broadcast(_offsets_by_pid(counts)), "__pid")
        .withColumn(name, F.col("__off") + F.row_number().over(w))
        .drop("__pid", "__off")
    )
