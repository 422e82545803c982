"""Exact deduplication by content hash.

Scale design: a single hash-partitioned shuffle on the content digest.
At 100 TB the digest (16 bytes) — not the payload — is the shuffle
key, and AQE handles bucket skew from pathological duplicate counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(
    df: DataFrame,
    content_cols: list[str],
    order_col: str,
    keep: str = "min",
) -> DataFrame:
    """Keep one row per distinct combination of ``content_cols``.

    The survivor is deterministic: the row with the ``min`` (or
    ``max``) value of ``order_col`` within each duplicate group —
    unlike ``dropDuplicates``, whose survivor is partition-order
    dependent and therefore not oracle-comparable.
    """
    if keep not in ("min", "max"):
        raise ValueError(f"keep must be 'min' or 'max', got {keep!r}")
    digest = F.md5(F.concat_ws("\x00", *[F.col(c) for c in content_cols]))
    order = F.col(order_col).asc() if keep == "min" else F.col(order_col).desc()
    w = Window.partitionBy(digest).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_groups(df: DataFrame, content_cols: list[str]) -> DataFrame:
    """Digest → group size + canonical (min) id, for groups of size > 1."""
    digest = F.md5(F.concat_ws("\x00", *[F.col(c) for c in content_cols]))
    return (
        df.select(digest.alias("digest"), *content_cols)
        .groupBy("digest")
        .agg(F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )
