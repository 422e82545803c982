"""Advanced relational surface: pivot/unpivot, exact percentiles,
RANGE window frames, approximate distinct counting.

None of these exist in the reference (SURVEY.md §2.6–2.7 mark the
whole agg/window space as **Gap**); they are part of the general
SQL/DataFrame capability the oracle demands. Determinism rules as in
:mod:`aws_etl_spark.queries.registry` — decimal-routed sums, unique-key
tiebreaks, identical aliases on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_etl_spark.queries.registry import load_table, register, sql_query

_PIVOT_YEARS = [1992, 1993, 1994, 1995, 1996, 1997, 1998]

_PIVOT_ORACLE = """
SELECT n.n_name,
""" + ",\n".join(
    f"       CAST(SUM(CASE WHEN YEAR(o.o_orderdate) = {y} "
    f"THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS y{y}"
    for y in _PIVOT_YEARS
) + """
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register(
    "pivot_revenue_by_year",
    oracle=_PIVOT_ORACLE,
    category="agg",
    tables=("orders", "customer", "nation"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation × order-year revenue matrix via df.groupBy().pivot().

    Physical shape: the two dim joins broadcast; pivot compiles to
    conditional partial aggregates (one shuffle on n_name, same as a
    plain group-by — pivot adds no extra exchange).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").alias("yr"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
    )
    pivoted = joined.groupBy("n_name").pivot("yr", _PIVOT_YEARS).sum("price")
    return pivoted.select(
        "n_name",
        *[F.col(str(y)).cast("double").alias(f"y{y}") for y in _PIVOT_YEARS],
    )


_UNPIVOT_ORACLE = """
SELECT p_partkey, metric, val FROM (
  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part
) u
"""


@register(
    "unpivot_part_metrics",
    oracle=_UNPIVOT_ORACLE,
    category="agg",
    tables=("part",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via df.unpivot (narrow, no shuffle)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "val")


_PCTL_ORACLE = """
SELECT l_returnflag,
       PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
       PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "agg_percentiles",
    oracle=_PCTL_ORACLE,
    category="agg",
    tables=("lineitem",),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    PERCENTILE_CONT: both linear-interpolate on the sorted values)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


_RANGE_WIN_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         RANGE BETWEEN 100 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS nearby_spend,
       COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         RANGE BETWEEN 100 PRECEDING AND CURRENT ROW
       ) AS nearby_orders
FROM orders
"""


@register(
    "window_range_frame",
    oracle=_RANGE_WIN_ORACLE,
    category="window",
    tables=("orders",),
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per customer, spend
    across orders whose key lies within 100 of the current one."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rangeBetween(-100, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("nearby_spend"),
        F.count("*").over(w).alias("nearby_orders"),
    )


@register(
    "agg_approx_distinct",
    oracle=None,  # HLL sketch values differ per engine; error-gated in
    # tests/test_advanced_rel.py against the exact count instead
    category="agg",
    tables=("orders",),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB substitute
    for exact COUNT(DISTINCT): no per-key shuffle of distinct values,
    one fixed-size sketch per group, mergeable map-side."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "agg_approx_percentiles",
    oracle=None,  # KLL/GK sketch values differ per engine; error-gated
    # in tests/test_advanced_rel.py against the exact interpolated
    # percentiles (agg_percentiles, which IS oracle-checked)
    category="agg",
    tables=("lineitem",),
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the 100 TB
    substitute for exact percentiles: exact interpolation needs a full
    sort (or all values per group on one node); the sketch is
    fixed-size per group, mergeable map-side, with a declared accuracy
    knob (here 1/10000 relative rank error)."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile_approx(
        "l_extendedprice", [0.25, 0.5, 0.75, 0.95], 10000
    )
    return li.groupBy("l_returnflag").agg(
        pct[0].alias("p25"),
        pct[1].alias("p50"),
        pct[2].alias("p75"),
        pct[3].alias("p95"),
        F.count("*").alias("n"),
    )


@register(
    "sample_stratified",
    oracle=None,  # engine RNGs differ; seeded-determinism + per-stratum
    # fraction bounds are asserted in tests/test_quality.py
    category="agg",
    tables=("orders",),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sampling (sampleBy): 10% of 'O' orders, 50%
    of 'F' — per-partition Bernoulli, no shuffle, reproducible under a
    fixed seed."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.sampleBy(
        "o_orderstatus", {"O": 0.1, "F": 0.5}, seed=42
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


_RESERVOIR_ORACLE = """
WITH ranked AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderstatus
           ORDER BY MD5(CONCAT(CAST(o_orderkey AS VARCHAR), ':42')), o_orderkey
         ) AS rk
  FROM orders
)
SELECT o_orderkey, o_orderstatus, o_totalprice, rk
FROM ranked WHERE rk <= 20
"""


@register(
    "sample_reservoir_deterministic",
    oracle=_RESERVOIR_ORACLE,
    category="agg",
    tables=("orders",),
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-group reservoir sample, deterministic across engines
    and partitionings: the 'random' order is md5(key || seed), so the
    same 20 orders per status are chosen everywhere — unlike RNG-based
    sampling (sample_stratified), this one is fully SQL-oracle-able.

    Scale shape: one hash-partitioned window per group; at extreme
    group skew, swap to the two-phase per-partition-top-k + merge the
    same way TakeOrderedAndProject does (k rows per partition bound
    memory)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":42"))),
        F.col("o_orderkey"),
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 20)
    )


sql_query(
    "window_distribution",
    """
    SELECT c_custkey, c_mktsegment,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume_d,
           CAST(FIRST_VALUE(c_custkey) OVER w2 AS BIGINT) AS seg_poorest,
           CAST(LAST_VALUE(c_custkey) OVER w2 AS BIGINT) AS seg_richest,
           CAST(NTH_VALUE(c_custkey, 2) OVER w2 AS BIGINT) AS seg_second
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey),
           w2 AS (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)
    """,
    category="window",
    doc=(
        "Distribution window functions (percent_rank/cume_dist) plus "
        "frame-pinned first/last/nth_value — completes the ranking "
        "family (window_ranking covers row_number/rank/dense_rank/"
        "ntile). percent_rank and cume_dist are int/int double "
        "divisions over (rank−1, n−1) — bit-deterministic; the value "
        "windows pin an explicit full frame because the engines' "
        "default ORDER BY frame (RANGE … CURRENT ROW) would make "
        "last_value the current row. Unique (c_acctbal, c_custkey) "
        "tiebreak keeps every column order-insensitive. One "
        "hash-partitioned window per segment — parallelism grows "
        "with segment count at scale."
    ),
    tables=("customer",),
)
