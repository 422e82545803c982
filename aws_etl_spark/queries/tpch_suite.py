"""The remaining classic TPC-H query shapes, adapted to the driver's
reduced star schema.

Q1/Q3/Q6/Q12/Q14 live in relational.py / reference_parity.py; this
module completes the family so the engine demonstrably covers every
classic warehouse plan shape: correlated scalar subqueries (Q2/Q17),
EXISTS / NOT EXISTS pairs (Q4/Q21/Q22), 6-way snowflake joins with a
cross-side key constraint (Q5), nation-pair self-joins (Q7), market
share with conditional aggregation over a subplan (Q8), left-join
histograms (Q13), view + scalar-max (Q15), disjunctive multi-range
pushdown (Q19), and decile-style IN-subquery HAVING thresholds
(Q18/Q20).

Schema adaptations (the driver tables have no partsupp, no
commit/receipt dates, no phone/container/comment columns):

* ``partsupp`` ⇢ the observed part–supplier bridge
  ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem`` (Q2/Q16);
  ``ps_supplycost`` ⇢ 10% of ``p_retailprice`` (Q9), ``ps_availqty``
  ⇢ half of a part's shipped quantity (Q20).
* late-delivery predicates (``l_commitdate < l_receiptdate``) ⇢
  returned items (``l_returnflag = 'R'``) in Q4/Q21.
* phone country codes ⇢ customer nations (Q22).

Every query is one ANSI text executed verbatim by both Spark and the
DuckDB oracle. Money math follows the corpus determinism convention
(registry.py module docstring): exact DECIMAL accumulation with
bounded operand precisions, ``ROUND(.., 2)`` before the final DOUBLE
cast, top-k always tiebroken on a unique key, YEAR() cast to BIGINT
(Spark yields int32, DuckDB int64).

At 100 TB these plans are the engine's bread and butter: every join
below broadcasts its dimension side(s) (region/nation/supplier/part
fit in memory at any SF; customer at most SFs), the lineitem scans
push their date/flag predicates into parquet, and the aggregates are
partial-agg'd map-side. The only full-fact shuffles are the
groupBy(l_orderkey / l_partkey / l_suppkey) aggregations, which AQE
coalesces; none of the correlated subqueries rewrite to per-row
execution (Catalyst decorrelates them into aggregate+join, asserted
in tests/test_plans.py).
"""

from __future__ import annotations

from aws_etl_spark.queries.registry import sql_query

_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(6,4)))"
)

sql_query(
    "tpch_q2_min_cost_supplier",
    f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eu AS (
  SELECT ps.l_partkey, ps.l_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT CAST(eu.s_acctbal AS DOUBLE) AS s_acctbal, eu.s_name, eu.n_name,
       p.p_partkey, p.p_brand
FROM part p
JOIN eu ON p.p_partkey = eu.l_partkey
WHERE p.p_type = 'STANDARD' AND p.p_size <= 15
  AND eu.s_acctbal = (SELECT MIN(e2.s_acctbal) FROM eu e2
                      WHERE e2.l_partkey = p.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    category="reference",
    doc="TPC-H Q2 shape: min-cost supplier per part via correlated "
    "scalar MIN over the observed part-supplier bridge (partsupp "
    "adaptation), region-filtered, top-100 with unique tiebreak.",
    tables=("part", "supplier", "nation", "region", "lineitem"),
)

sql_query(
    "tpch_q4_priority_returns",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    category="reference",
    doc="TPC-H Q4 shape: EXISTS → left-semi join, priority counts "
    "(late-delivery predicate adapted to returned items).",
    tables=("orders", "lineitem"),
)

sql_query(
    "tpch_q5_local_supplier_volume",
    f"""
SELECT n_name,
       CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
    category="reference",
    doc="TPC-H Q5 shape: 6-way snowflake join with the customer-nation "
    "= supplier-nation cross-constraint, revenue per nation.",
    tables=("customer", "orders", "lineitem", "supplier", "nation", "region"),
)

sql_query(
    "tpch_q7_volume_shipping",
    f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
         {_REV} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    category="reference",
    doc="TPC-H Q7 shape: bidirectional nation-pair trade volume — the "
    "nation table joins twice under different roles.",
    tables=("supplier", "lineitem", "orders", "customer", "nation"),
)

sql_query(
    "tpch_q8_market_share",
    f"""
WITH all_sales AS (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         {_REV} AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
),
by_year AS (
  SELECT o_year,
         CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                             ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
           AS nation_volume,
         CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_volume
  FROM all_sales GROUP BY o_year
)
SELECT o_year, ROUND(nation_volume / total_volume, 6) AS mkt_share,
       nation_volume, total_volume
FROM by_year
""",
    category="reference",
    doc="TPC-H Q8 shape: one nation's market share of a region-segment "
    "market by year — 8-way join, conditional agg, both operands of "
    "the share division settled to exact-decimal-then-double first.",
    tables=(
        "part", "lineitem", "supplier", "orders", "customer",
        "nation", "region",
    ),
)

sql_query(
    "tpch_q9_product_profit",
    f"""
SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         {_REV}
           - CAST(p_retailprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(4,0))
             * CAST(0.1 AS DECIMAL(3,1)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
    category="reference",
    doc="TPC-H Q9 shape: profit per supplier-nation per year for a "
    "part-name family; ps_supplycost adapted to 10% of retail price.",
    tables=("part", "lineitem", "supplier", "orders", "nation"),
)

sql_query(
    "tpch_q10_returned_items",
    f"""
SELECT c_custkey, c_name,
       CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    category="reference",
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue in "
    "a quarter.",
    tables=("customer", "orders", "lineitem", "nation"),
)

sql_query(
    "tpch_q11_important_parts",
    """
WITH part_value AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey,
       CAST(ROUND(value_dec, 2) AS DOUBLE) AS part_value
FROM part_value
WHERE CAST(value_dec AS DOUBLE) >
      (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM part_value) * 0.0015
ORDER BY part_value DESC, p_partkey
""",
    category="reference",
    doc="TPC-H Q11 shape: parts holding an outsized share of one "
    "nation's traded value — scalar-subquery threshold over a reused "
    "CTE (partsupp value adapted to shipped extendedprice).",
    tables=("lineitem", "supplier", "nation"),
)

sql_query(
    "tpch_q13_order_distribution",
    """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
       AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
""",
    category="reference",
    doc="TPC-H Q13 shape: customer order-count distribution via "
    "filtered left join (zero-order customers kept), then histogram.",
    tables=("customer", "orders"),
)

sql_query(
    "tpch_q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_REV}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
""",
    category="reference",
    doc="TPC-H Q15 shape: supplier(s) achieving the quarter's maximum "
    "revenue — scalar MAX over a reused revenue view; the equality "
    "compares exact decimals, not doubles.",
    tables=("supplier", "lineitem"),
)

sql_query(
    "tpch_q16_supplier_part_counts",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON p_partkey = ps.l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    category="reference",
    doc="TPC-H Q16 shape: distinct supplier counts per (brand, type, "
    "size) excluding a NOT-IN supplier denylist (complaint filter "
    "adapted to negative account balance).",
    tables=("lineitem", "part", "supplier"),
)

sql_query(
    "tpch_q17_small_qty_revenue",
    """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
         / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#5' AND p_type = 'SMALL'
  AND l_quantity <
      (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2)))
                          AS DOUBLE) / COUNT(*))
       FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    category="reference",
    doc="TPC-H Q17 shape: average yearly revenue lost to small-quantity "
    "orders — correlated per-part 20%-of-average threshold "
    "(decorrelates to an aggregate+join, not per-row execution).",
    tables=("lineitem", "part"),
)

sql_query(
    "tpch_q18_volume_customers",
    """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    category="reference",
    doc="TPC-H Q18 shape: large-volume orders (quantity sum over a "
    "threshold), top-100 by price with unique tiebreak.",
    tables=("customer", "orders", "lineitem"),
)

sql_query(
    "tpch_q19_disjunctive_revenue",
    f"""
SELECT CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    category="reference",
    doc="TPC-H Q19 shape: disjunctive multi-range predicate spanning "
    "both join sides (container/shipmode clauses dropped — absent "
    "columns); Catalyst extracts the common join key and pushes the "
    "per-side conjuncts.",
    tables=("lineitem", "part"),
)

sql_query(
    "tpch_q20_promotion_suppliers",
    """
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
),
part_total AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
)
SELECT s_name, s_suppkey
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
  AND s_suppkey IN (
    SELECT sh.l_suppkey
    FROM shipped sh
    JOIN part_total pt ON sh.l_partkey = pt.l_partkey
    WHERE CAST(sh.qty AS DOUBLE) > 0.5 * CAST(pt.total_qty AS DOUBLE))
ORDER BY s_suppkey
""",
    category="reference",
    doc="TPC-H Q20 shape: suppliers dominating a part family's yearly "
    "flow (ps_availqty adapted to half the part's shipped quantity), "
    "IN-subquery → left-semi join.",
    tables=("supplier", "nation", "lineitem", "part"),
)

sql_query(
    "tpch_q21_sole_return_suppliers",
    """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_7'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    category="reference",
    doc="TPC-H Q21 shape: suppliers solely at fault in multi-supplier "
    "orders — paired EXISTS / NOT EXISTS on non-equal correlated keys "
    "(late-delivery predicate adapted to returned items).",
    tables=("supplier", "lineitem", "orders", "nation"),
)

sql_query(
    "tpch_q22_dormant_customers",
    """
SELECT n_name AS cust_nation, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2)))
                               AS DOUBLE) / COUNT(*)
                   FROM customer c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY n_name
""",
    category="reference",
    doc="TPC-H Q22 shape: well-funded customers gone dormant (no order "
    "since 1999; every synthetic customer has SOME order, so pure "
    "no-orders selects nothing), by nation (phone country code "
    "adapted to nation) — uncorrelated above-average threshold plus "
    "anti-join.",
    tables=("customer", "nation", "orders"),
)
