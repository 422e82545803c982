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
