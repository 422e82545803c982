"""Reference-parity queries: the curated transformation, re-expressed.

The reference's only real query (k8s/codes/variables.py:18-89, executed
by k8s/codes/transformation.py:41) is:

  WITH all_sales AS (3-way UNION ALL of per-year sales tables),
  info AS (all_sales LEFT JOIN 4 dimension tables on single keys,
           LEFT JOIN returns on a composite key that is NOT the
           returns grain — multiplying rows — with per-column casts:
           M/d/yyyy date parsing via unix_timestamp/from_unixtime,
           currency stripping via nested replace, decimal(10,2) casts,
           NVL(ReturnQuantity, 0))
  SELECT * FROM info

``curated_denormalization`` reproduces every one of those semantics on
the driver's star schema: year-sliced orders play the per-year sales
tables, customer→nation→region plays the dimension chain, and
lineitem rows with l_returnflag='R' play Returns (joined on o_orderkey
only — not lineitem's grain — so matched orders multiply, and
quantity is NVL-defaulted while return_date stays NULL on miss,
exactly like variables.py:59-60).
"""

from __future__ import annotations

from aws_etl_spark.queries.registry import sql_query

_SPARK_CURATED = """
WITH all_sales AS (
  SELECT * FROM orders WHERE YEAR(o_orderdate) = 1995
  UNION ALL
  SELECT * FROM orders WHERE YEAR(o_orderdate) = 1996
  UNION ALL
  SELECT * FROM orders WHERE YEAR(o_orderdate) = 1997
),
info AS (
  SELECT
    CAST(FROM_UNIXTIME(UNIX_TIMESTAMP(DATE_FORMAT(a.o_orderdate, 'M/d/yyyy'),
                                      'M/d/yyyy'), 'yyyy-MM-dd') AS TIMESTAMP)
      AS order_date,
    CAST(a.o_orderkey AS INT) AS order_key,
    CAST(a.o_custkey AS INT) AS customer_key,
    a.o_orderstatus AS order_status,
    a.o_orderpriority AS order_priority,
    CAST(a.o_totalprice AS DECIMAL(10,2)) AS total_price,
    b.c_name AS customer_name,
    CAST(REPLACE(REPLACE(CONCAT('$', CAST(CAST(b.c_acctbal AS DECIMAL(12,2)) AS STRING)),
                         '$', ''), ',', '') AS DECIMAL(10,2)) AS annual_income,
    b.c_mktsegment AS market_segment,
    c.n_name AS nation_name,
    d.r_name AS region_name,
    CAST(NVL(r.l_quantity, 0) AS DOUBLE) AS return_quantity,
    CAST(FROM_UNIXTIME(UNIX_TIMESTAMP(DATE_FORMAT(r.l_shipdate, 'M/d/yyyy'),
                                      'M/d/yyyy'), 'yyyy-MM-dd') AS TIMESTAMP)
      AS return_date
  FROM all_sales a
  LEFT JOIN customer b ON a.o_custkey = b.c_custkey
  LEFT JOIN nation   c ON b.c_nationkey = c.n_nationkey
  LEFT JOIN region   d ON c.n_regionkey = d.r_regionkey
  LEFT JOIN (SELECT l_orderkey, l_quantity, l_shipdate FROM lineitem
             WHERE l_returnflag = 'R') r
    ON a.o_orderkey = r.l_orderkey
)
SELECT * FROM info
"""

_DUCK_CURATED = """
WITH all_sales AS (
  SELECT * FROM orders WHERE YEAR(o_orderdate) = 1995
  UNION ALL
  SELECT * FROM orders WHERE YEAR(o_orderdate) = 1996
  UNION ALL
  SELECT * FROM orders WHERE YEAR(o_orderdate) = 1997
),
info AS (
  SELECT
    CAST(CAST(TRY_STRPTIME(STRFTIME(a.o_orderdate, '%-m/%-d/%Y'), '%-m/%-d/%Y')
              AS DATE) AS TIMESTAMP) AS order_date,
    CAST(a.o_orderkey AS INT) AS order_key,
    CAST(a.o_custkey AS INT) AS customer_key,
    a.o_orderstatus AS order_status,
    a.o_orderpriority AS order_priority,
    CAST(a.o_totalprice AS DECIMAL(10,2)) AS total_price,
    b.c_name AS customer_name,
    CAST(REPLACE(REPLACE(CONCAT('$', CAST(CAST(b.c_acctbal AS DECIMAL(12,2)) AS VARCHAR)),
                         '$', ''), ',', '') AS DECIMAL(10,2)) AS annual_income,
    b.c_mktsegment AS market_segment,
    c.n_name AS nation_name,
    d.r_name AS region_name,
    CAST(COALESCE(r.l_quantity, 0) AS DOUBLE) AS return_quantity,
    CAST(CAST(TRY_STRPTIME(STRFTIME(r.l_shipdate, '%-m/%-d/%Y'), '%-m/%-d/%Y')
              AS DATE) AS TIMESTAMP) AS return_date
  FROM all_sales a
  LEFT JOIN customer b ON a.o_custkey = b.c_custkey
  LEFT JOIN nation   c ON b.c_nationkey = c.n_nationkey
  LEFT JOIN region   d ON c.n_regionkey = d.r_regionkey
  LEFT JOIN (SELECT l_orderkey, l_quantity, l_shipdate FROM lineitem
             WHERE l_returnflag = 'R') r
    ON a.o_orderkey = r.l_orderkey
)
SELECT * FROM info
"""

# The pipeline writes the curated table exactly as the reference types
# it (DECIMAL(10,2) money columns — variables.py:40,47); the
# driver-checked query wraps it with a final DOUBLE render because
# Decimal objects hash differently from DuckDB's float64 under the
# driver's canonicalizer (CORRECTNESS_r01). Semantics — including
# DECIMAL overflow→NULL — happen before the cast in both dialects.
_DRIVER_STABLE_WRAP = """
SELECT order_date, order_key, customer_key, order_status, order_priority,
       CAST(total_price AS DOUBLE) AS total_price,
       customer_name,
       CAST(annual_income AS DOUBLE) AS annual_income,
       market_segment, nation_name, region_name, return_quantity, return_date
FROM ({inner})
"""

sql_query(
    "curated_denormalization",
    _DRIVER_STABLE_WRAP.format(inner=_SPARK_CURATED),
    oracle=_DRIVER_STABLE_WRAP.format(inner=_DUCK_CURATED),
    category="reference_parity",
    doc=(
        "Full reference curated query shape (variables.py:18-89): UNION ALL "
        "year slices → left-join dimension chain → row-multiplying returns "
        "join with NVL fill, M/d/yyyy round-trips, currency strip, "
        "decimal(10,2) casts (rendered as DOUBLE in the output so both "
        "engines hand the driver the same dtype; the DECIMAL(10,2) "
        "overflow→NULL semantics still apply before the final cast)."
    ),
    tables=("orders", "customer", "nation", "region", "lineitem"),
)

sql_query(
    "row_count_validation",
    """
    SELECT 'orders' AS table_name, COUNT(*) AS n FROM orders
    UNION ALL SELECT 'lineitem' AS table_name, COUNT(*) AS n FROM lineitem
    UNION ALL SELECT 'customer' AS table_name, COUNT(*) AS n FROM customer
    UNION ALL SELECT 'supplier' AS table_name, COUNT(*) AS n FROM supplier
    UNION ALL SELECT 'part' AS table_name, COUNT(*) AS n FROM part
    UNION ALL SELECT 'nation' AS table_name, COUNT(*) AS n FROM nation
    UNION ALL SELECT 'region' AS table_name, COUNT(*) AS n FROM region
    """,
    category="reference_parity",
    doc=(
        "Cross-store row-count reconciliation (the reference's de-facto test "
        "suite: Athena/Postgres count(*), etl_aws_vini.py:244-256) in-engine."
    ),
)


# Classic TPC-H-shaped analytics over the driver tables (columns
# restricted to the synthetic schema). One SQL text runs verbatim on
# both engines; money math routes through exact DECIMAL and is rounded
# before the final DOUBLE cast (DuckDB's decimal→double cast
# double-rounds above 2^53 otherwise).

sql_query(
    "tpch_q6_forecast_revenue",
    """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(8,4))), 2) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.08
  AND l_quantity < 24
""",
    category="reference",
    doc="TPC-H Q6 shape: single-scan forecast-revenue aggregate "
    "(predicate-pushdown showcase; no shuffle beyond the final agg).",
    tables=("lineitem",),
)

sql_query(
    "tpch_q3_unshipped_revenue",
    """
SELECT l_orderkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE)
         AS revenue,
       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    category="reference",
    doc="TPC-H Q3 shape: 3-way join, decimal revenue agg, top-10 with "
    "unique-key tiebreak.",
    tables=("customer", "orders", "lineitem"),
)

sql_query(
    "tpch_q12_priority_shipping",
    """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_linestatus
""",
    category="reference",
    doc="TPC-H Q12 shape: join + conditional counts (BIGINT-cast: "
    "DuckDB SUM yields HUGEINT).",
    tables=("orders", "lineitem"),
)

sql_query(
    "tpch_q14_promo_revenue",
    """
WITH s AS (
  SELECT
    CAST(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(8,4)))
                        ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
      AS promo,
    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE)
      AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
)
SELECT ROUND(100 * promo / total, 6) AS promo_revenue_pct, promo, total
FROM s
""",
    category="reference",
    doc="TPC-H Q14 shape: promo revenue share — both sums settled to "
    "exact-decimal-then-double BEFORE the (IEEE-identical) division.",
    tables=("lineitem", "part"),
)
