"""Skew-defense queries: the ops/scale.py salting operators run as
driver-checkable, DuckDB-oracled registry entries.

The salted rewrites are RESULT-PRESERVING by construction — salting
changes the physical shuffle layout, never the relational answer — so
the oracle is simply the plain (unsalted) SQL. That is the point of
registering them: a green hash row proves the skew machinery is
side-effect-free, the property a pipeline relies on when it flips a
hot join/agg to the salted form at 100 TB (one key ≫ one task's
memory — the regime beyond AQE's runtime skew-split, which only
handles moderate skew and does not cover aggregations at all).

Money sums follow the corpus-wide exact-decimal convention
(DECIMAL(12,2) × (1 − DECIMAL(6,4)), ROUND(…, 2) before the final
double cast) so the two-phase salted sum is order-independent and
hash-identical to DuckDB's single-node fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.ops import salted_agg, salted_join
from aws_etl_spark.queries.registry import load_table, register

_SALTED_ORACLE = """
SELECT s_nationkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


@register(
    "join_skew_salted",
    oracle=_SALTED_ORACLE,
    category="scale",
    tables=("lineitem", "supplier"),
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation revenue via salted join + salted two-phase
    aggregation — the full hot-key pipeline: the fact side's join key
    is salted across 8 shuffle partitions (dimension replicated ×8),
    then the group key is salted again for the aggregation (phase 1
    per (key, salt) with map-side combine, phase 2 merges ≤8 partial
    rows per key). Exact-decimal sums make the result independent of
    the salt-induced partitioning, which is exactly what the oracle
    hash proves."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"),
        (
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)"))
        ).alias("rev"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = salted_join(li, supp, "suppkey", n_salts=8)
    agg = salted_agg(
        joined,
        ["s_nationkey"],
        {"revenue": ("rev", "sum"), "n_items": ("rev", "count")},
        n_salts=8,
    )
    return agg.select(
        "s_nationkey",
        F.round(F.col("revenue"), 2).cast("double").alias("revenue"),
        F.col("n_items").cast("bigint").alias("n_items"),
    )


_BLOOM_ORACLE = """
SELECT s_suppkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_nationkey = 19
GROUP BY s_suppkey
"""


@register(
    "join_bloom_pruned",
    oracle=_BLOOM_ORACLE,
    category="scale",
    tables=("lineitem", "supplier"),
)
def q_join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by supplier for ONE nation's suppliers, executed as a
    Bloom-pruned shuffle join: the selective dimension (one nationkey, ≈1/25 of
    suppliers) builds a bitmap (``ops/bloom.py`` — one tiny bit_or
    agg), the fact side is broadcast-probed and filtered BEFORE its
    shuffle, then the exact join runs on the survivors. False
    positives only cost shuffle rows; the join stays exact, so the
    plain-SQL oracle hash proves the mechanism is result-preserving
    (the ``join_skew_salted`` proof pattern). The merge hint pins the
    shuffle-join shape the mechanism exists for — with a
    broadcast-able dim the prune would be pointless (the big side
    never shuffles), which is exactly the 100 TB regime this row
    rehearses: a dimension too big to broadcast, most fact rows
    keyless. Plan pinned by tests/test_plans.py (probe filter below
    the fact-side exchange)."""
    from aws_etl_spark.ops.scale import bloom_pruned_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"),
        (
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)"))
        ).alias("rev"),
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 19)
        .select(F.col("s_suppkey").alias("suppkey"))
        .hint("merge")
    )
    joined = bloom_pruned_join(li, supp, "suppkey", m_bits=1 << 17)
    return (
        joined.groupBy("suppkey")
        .agg(
            F.sum("rev").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.col("suppkey").alias("s_suppkey"),
            F.round(F.col("revenue"), 2).cast("double").alias("revenue"),
            F.col("n_items").cast("bigint").alias("n_items"),
        )
    )
