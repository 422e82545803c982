"""Temporal-join queries: SCD2 point-in-time lookup composed from the
engine's own operators (``scd2_from_history`` + union-sort
``asof_join``).

The classic warehouse question — "which dimension version was active
when this fact happened" — is a non-equi interval join in SQL
(``fact.ts BETWEEN valid_from AND valid_to``), which engines execute
as a quadratic theta join. Here it runs as ONE hash shuffle on the
dimension key + an in-partition sort (ops/asof.py): dimension
versions and facts union on the key, the active version is carried
forward with ``last(ignorenulls)``. Linear at any scale; the DuckDB
oracle states the same semantics as the interval join, pinning
equivalence of the two formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_etl_spark.ops.asof import asof_join
from aws_etl_spark.ops.incremental import scd2_from_history
from aws_etl_spark.queries.registry import load_table, register

_PIT_ORACLE = """
WITH h0 AS (
  SELECT o_custkey AS cust, CAST(o_orderdate AS TIMESTAMP) AS ts,
         o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
),
h1 AS (SELECT cust, ts, o_orderpriority FROM h0 WHERE rn = 1),
h2 AS (
  SELECT cust, ts, o_orderpriority,
         LAG(o_orderpriority) OVER (PARTITION BY cust ORDER BY ts) AS prev
  FROM h1
),
versions AS (
  SELECT cust, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY cust ORDER BY ts) AS valid_to,
         o_orderpriority
  FROM h2 WHERE prev IS NULL OR o_orderpriority <> prev
),
facts AS (
  SELECT l.l_orderkey, l.l_linenumber, o.o_custkey AS cust,
         CAST(l.l_shipdate AS TIMESTAMP) AS ts
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
)
SELECT f.l_orderkey, f.l_linenumber, f.cust, f.ts,
       v.valid_from AS priority_since,
       v.o_orderpriority AS active_priority
FROM facts f
LEFT JOIN versions v
  ON f.cust = v.cust
 AND f.ts >= v.valid_from
 AND (v.valid_to IS NULL OR f.ts < v.valid_to)
"""


@register(
    "join_scd2_pointintime",
    oracle=_PIT_ORACLE,
    category="temporal",
    tables=("orders", "lineitem"),
)
def q_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join of 1996 shipments against the SCD2 history
    of each customer's order priority: for every fact, the dimension
    version active at ship time.

    Composition: ``scd2_from_history`` builds validity intervals (one
    key shuffle); ``asof_join`` resolves the active version via
    union-sort (one more key shuffle) — NO interval theta join
    anywhere in the plan. The oracle is the equivalent non-equi
    interval join, so the driver pins the two formulations equal."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    w_dedupe = Window.partitionBy("cust", "ts").orderBy(
        F.col("o_orderkey").desc()
    )
    history = (
        orders.select(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderdate").alias("ts"),
            "o_orderpriority",
            "o_orderkey",
        )
        .withColumn("rn", F.row_number().over(w_dedupe))
        .filter(F.col("rn") == 1)
        .select("cust", "ts", "o_orderpriority")
    )
    dim = scd2_from_history(history, ["cust"], "ts", ["o_orderpriority"])

    facts = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("o_custkey").alias("cust"),
            F.col("l_shipdate").alias("ts"),
        )
    )
    joined = asof_join(
        facts,
        dim.select(
            "cust",
            F.col("valid_from").alias("ts"),
            "o_orderpriority",
        ),
        on=["cust"],
        ts_col="ts",
        right_value_cols=["o_orderpriority"],
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "cust",
        "ts",
        F.col("asof_ts").alias("priority_since"),
        F.col("asof_o_orderpriority").alias("active_priority"),
    )
