"""Relational operator corpus (SURVEY.md §2.3–§2.9).

The reference's own relational surface is tiny — projections with
casts, left equi-joins, UNION ALL, count(*) (see SURVEY.md §2) — but
the correctness oracle requires general SQL capability in every
category. Each query here is one declared capability; most are shared
ANSI-SQL text run by both Spark and DuckDB.

Exact-arithmetic convention: money math goes through DECIMAL so that
Spark's distributed partial aggregation and DuckDB's serial aggregation
agree bit-for-bit; final cast to DOUBLE unifies the output schema.
"""

from __future__ import annotations

from aws_etl_spark.queries.registry import sql_query

# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.6) — TPC-H-shaped
# ---------------------------------------------------------------------------

sql_query(
    "q1_pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(6,4)))
               * (1 + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_charge,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    category="agg",
    doc=(
        "TPC-H Q1 shape: scan+filter+hash-agg with exact decimal money "
        "math. Two portability guards (caught by the strict comparator at "
        "sf0.01): product operands are precision-bounded so neither engine "
        "overflows decimal width 38, and high-scale decimal sums are "
        "ROUND(...,2)'d BEFORE the double cast — DuckDB converts "
        "decimal→double as int128→double ÷ 10^scale (two roundings, "
        "inexact once the scaled integer exceeds 2^53) while Spark's "
        "BigDecimal→double is correctly rounded; at scale 2 the integer "
        "fits 2^53 and both are exact."
    ),
    tables=("lineitem",),
)

sql_query(
    "agg_distinct_counts",
    """
    SELECT
      o_orderpriority,
      COUNT(*) AS n_orders,
      COUNT(DISTINCT o_custkey) AS n_customers,
      CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
      CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    category="agg",
    doc="count-distinct + min/max per group.",
    tables=("orders",),
)

sql_query(
    "agg_rollup",
    """
    SELECT
      COALESCE(l_returnflag, 'ALL') AS returnflag,
      COALESCE(l_linestatus, 'ALL') AS linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    category="agg",
    doc="ROLLUP hierarchy totals.",
    tables=("lineitem",),
)

sql_query(
    "agg_grouping_sets",
    """
    SELECT
      COALESCE(o_orderstatus, 'ALL') AS orderstatus,
      COALESCE(o_orderpriority, 'ALL') AS orderpriority,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    category="agg",
    doc="GROUPING SETS over independent dimensions.",
    tables=("orders",),
)

sql_query(
    "agg_cube",
    """
    SELECT
      COALESCE(l_returnflag, 'ALL') AS returnflag,
      COALESCE(l_linestatus, 'ALL') AS linestatus,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    category="agg",
    doc="CUBE: all grouping combinations.",
    tables=("lineitem",),
)

sql_query(
    "agg_having",
    """
    SELECT l_partkey, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) > 30
    """,
    category="agg",
    doc="HAVING: post-aggregation filter.",
    tables=("lineitem",),
)

# ---------------------------------------------------------------------------
# Filters / predicates (SURVEY §2.3)
# ---------------------------------------------------------------------------

sql_query(
    "filter_predicates",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 50000
      AND o_orderpriority LIKE '1-%'
      AND o_orderdate >= TIMESTAMP '1993-01-01 00:00:00'
      AND NOT (o_custkey IS NULL)
    """,
    category="filter",
    doc="IN / BETWEEN / LIKE / IS NULL / AND-OR-NOT predicate surface.",
    tables=("orders",),
)

sql_query(
    "filter_case_when",
    """
    SELECT
      CASE WHEN l_quantity < 10 THEN 'small'
           WHEN l_quantity < 30 THEN 'medium'
           ELSE 'large' END AS size_band,
      CASE WHEN l_discount >= 0.05 THEN 'discounted' ELSE 'full_price' END AS price_band,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
    category="filter",
    doc="CASE WHEN bucketing + positional GROUP BY.",
    tables=("lineitem",),
)

# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4) — every join type
# ---------------------------------------------------------------------------

sql_query(
    "join_inner_multiway",
    """
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    category="join",
    doc="TPC-H Q5 shape: 5-way inner join chain, small dims broadcastable.",
    tables=("customer", "orders", "lineitem", "nation", "region"),
)

sql_query(
    "join_left",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderstatus
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
    """,
    category="join",
    doc="Left outer join with extra join-condition predicate (null-extending).",
    tables=("customer", "orders"),
)

sql_query(
    "join_right",
    """
    SELECT o_orderkey, c_custkey, c_name
    FROM orders
    RIGHT JOIN customer ON c_custkey = o_custkey
    """,
    category="join",
    doc="Right outer join.",
    tables=("customer", "orders"),
)

sql_query(
    "join_full_outer",
    """
    SELECT a.k AS k_high, b.k AS k_low, a.n AS n_high, b.n AS n_low
    FROM (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
          WHERE o_totalprice > 30000 GROUP BY o_custkey) a
    FULL OUTER JOIN
         (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
          WHERE o_totalprice <= 30000 GROUP BY o_custkey) b
      ON a.k = b.k
    """,
    category="join",
    doc="Full outer join of two aggregated sides.",
    tables=("orders",),
)

sql_query(
    "join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    category="join",
    doc="Left-semi join via correlated EXISTS.",
    tables=("customer", "orders"),
)

sql_query(
    "join_anti",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    category="join",
    doc="Left-anti join via NOT EXISTS (customers with no orders).",
    tables=("customer", "orders"),
)

sql_query(
    "join_cross",
    """
    SELECT r1.r_name AS region_a, r2.r_name AS region_b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
    category="join",
    doc="Cross join (tiny-side only; unordered region pairs).",
    tables=("region",),
)

sql_query(
    "join_theta",
    """
    SELECT s_suppkey, s_name, p_partkey, p_retailprice
    FROM supplier JOIN part
      ON p_retailprice > s_acctbal AND p_size < 10
    """,
    category="join",
    doc="Theta (non-equi) join on inequality conditions.",
    tables=("supplier", "part"),
)

sql_query(
    "join_composite_key",
    """
    SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
           l2.l_quantity AS matched_qty
    FROM lineitem l
    LEFT JOIN (SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
               WHERE l_returnflag = 'R') l2
      ON l.l_partkey = l2.l_partkey AND l.l_suppkey = l2.l_suppkey
    WHERE l.l_orderkey < 100
    """,
    category="join",
    doc=(
        "Composite-key left join that multiplies rows (reference Returns-join "
        "semantics, variables.py:79-83: key is not the right side's grain)."
    ),
    tables=("lineitem",),
)

# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.5)
# ---------------------------------------------------------------------------

sql_query(
    "set_union_all",
    """
    SELECT o_orderkey AS k, 'high' AS bucket FROM orders WHERE o_totalprice > 40000
    UNION ALL
    SELECT o_orderkey AS k, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey AS k, 'open' AS bucket FROM orders WHERE o_orderstatus = 'O'
    """,
    category="setop",
    doc="UNION ALL of three same-schema branches (reference all_sales CTE shape).",
    tables=("orders",),
)

sql_query(
    "set_union_distinct",
    """
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 40000
    UNION
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    category="setop",
    doc="UNION with duplicate elimination.",
    tables=("orders",),
)

sql_query(
    "set_intersect",
    """
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority LIKE '1-%'
    """,
    category="setop",
    doc="INTERSECT (distinct).",
    tables=("orders",),
)

sql_query(
    "set_except",
    """
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
    category="setop",
    doc="EXCEPT (distinct anti-set).",
    tables=("customer", "orders"),
)

# ---------------------------------------------------------------------------
# Window functions, sorts, limits (SURVEY §2.7)
# ---------------------------------------------------------------------------

sql_query(
    "window_ranking",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal_2 AS c_acctbal, rn, rnk, drnk, quartile
    FROM (
      SELECT c_mktsegment, c_custkey,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal_2,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn,
             RANK()       OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rnk,
             DENSE_RANK() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS drnk,
             NTILE(4)     OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS quartile
      FROM customer
    ) t
    WHERE rn <= 5
    """,
    category="window",
    doc="Top-k per group: row_number/rank/dense_rank/ntile with unique tiebreak.",
    tables=("customer",),
)

sql_query(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total,
           COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    """,
    category="window",
    doc="Running sum with explicit ROWS frame + partition-wide count.",
    tables=("orders",),
)

sql_query(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           CAST(DATEDIFF(o_orderdate,
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)) AS BIGINT)
             AS days_since_prev,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_order
    FROM orders
    """,
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(DATEDIFF('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_order
    FROM orders
    """,
    category="window",
    doc="lag/lead analytics (DuckDB datediff argument order differs).",
    tables=("orders",),
)

sql_query(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    category="sort",
    doc="Global top-k: ORDER BY + LIMIT with unique tiebreak.",
    tables=("orders",),
)

# ---------------------------------------------------------------------------
# Subqueries / CTEs (reference uses a 3-branch CTE, variables.py:19-25)
# ---------------------------------------------------------------------------

sql_query(
    "cte_subquery",
    """
    WITH cust_totals AS (
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
             COUNT(*) AS n
      FROM orders GROUP BY o_custkey
    ),
    seg_tot AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS seg_spend,
             COUNT(*) AS n_cust
      FROM cust_totals JOIN customer ON c_custkey = o_custkey
      GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment, t.n AS n_orders
    FROM customer c
    JOIN cust_totals t ON c.c_custkey = t.o_custkey
    JOIN seg_tot s ON c.c_mktsegment = s.c_mktsegment
    WHERE t.spend * s.n_cust > s.seg_spend
    """,
    category="subquery",
    doc=(
        "Chained CTEs + above-average filter, multiplied through to avoid "
        "an order-dependent float average (spend*n > total ⇔ spend > avg)."
    ),
    tables=("customer", "orders"),
)

sql_query(
    "scalar_subquery",
    """
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
    FROM orders
    WHERE o_totalprice > (SELECT MAX(o_totalprice) * 0.5 FROM orders)
    """,
    category="subquery",
    doc="Uncorrelated scalar subquery in predicate (max: order-independent).",
    tables=("orders",),
)

sql_query(
    "subquery_correlated_exists",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o2
      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P'
    )
    """,
    category="subquery",
    doc="Correlated EXISTS / NOT EXISTS (planned as semi/anti joins).",
    tables=("customer", "orders"),
)

sql_query(
    "subquery_in_correlated_agg",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (
      SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    ) > 2 * (
      SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
    category="subquery",
    doc="Correlated scalar aggregate subqueries (decorrelated by Catalyst into "
        "joins); the avg comparison is cross-multiplied into exact decimal "
        "arithmetic so borderline rows cannot flip between engines.",
    tables=("orders",),
)


sql_query(
    "graph_reachability_recursive",
    """
    WITH RECURSIVE
    edges AS (
      SELECT n_nationkey AS src,
             CAST((n_nationkey * 2 + 7) % 25 AS INTEGER) AS dst
      FROM nation
    ),
    reach(node, depth) AS (
      SELECT CAST(0 AS INTEGER), 0
      UNION ALL
      SELECT e.dst, r.depth + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.depth < 21
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(MIN(depth) AS BIGINT) AS first_depth,
           COUNT(*) AS n_visits
    FROM reach
    GROUP BY node
    """,
    category="relational",
    doc=(
        "Recursive CTE (Spark 4): breadth-first reachability with "
        "depth accounting over a functional graph derived from the "
        "nation table — the declarative form of the iterative "
        "frontier-expansion join that components.py/pagerank.py hand "
        "roll. DECLARED-SURFACE DEMO, deliberately bounded: the walk "
        "from node 0 closes its cycle at depth 20, so the guard stops "
        "at 21 — the minimum that still proves revisit accounting "
        "(n_visits=2 on the cycle entry nodes); every extra step is a "
        "full sequential join stage bought for nothing. Spark "
        "executes each recursion step as a joined union of the "
        "previous frontier (same physical shape as the manual loop, "
        "minus the localCheckpoint/frontier-cap control — which is "
        "why the hand-rolled iterative operators in components.py/"
        "pagerank.py remain the 100 TB path for deep or wide "
        "recursions; see CAPABILITIES.md env/scale caveats). "
        "Identical text runs on DuckDB."
    ),
    tables=("nation",),
)


sql_query(
    "join_lateral_topn",
    """
    SELECT n.n_name, l.c_custkey, l.c_acctbal
    FROM nation n,
    LATERAL (
      SELECT c_custkey, c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 3
    ) l
    """,
    category="relational",
    doc=(
        "LATERAL correlated subquery: top-3 customers per nation — "
        "the SQL-standard form of grouped top-k. Catalyst decorrelates "
        "the lateral into a ranked window join (same physical plan "
        "family as window_ranking), so the correlated LIMIT never "
        "executes per-row; unique (c_acctbal, c_custkey) ordering "
        "keeps the result deterministic. Identical text runs on "
        "DuckDB."
    ),
    tables=("nation", "customer"),
)


sql_query(
    "sort_limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
    category="relational",
    doc=(
        "Keyset-free pagination: ORDER BY + LIMIT/OFFSET (page 3 of "
        "20). Spark plans offset+limit as a single bounded "
        "TakeOrdered-style collect of offset+limit rows — fine for "
        "shallow pages; the doc-warning for 100 TB is that deep "
        "OFFSET scans offset+limit rows per query, so deep pagination "
        "belongs to keyset predicates (WHERE (price, key) < "
        "last_seen) instead. Decimal sort key keeps cross-engine "
        "order exact; unique tiebreak pins the page boundary."
    ),
    tables=("orders",),
)


sql_query(
    "agg_grouping_flags",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    category="agg",
    doc=(
        "GROUPING() flags alongside grouping sets — the disambiguator "
        "between 'NULL because aggregated away' and 'NULL in the "
        "data', which every BI consumer of a rollup needs. Same "
        "expand+aggregate plan as agg_grouping_sets; the flags are "
        "computed from the grouping bit vector, no extra shuffle."
    ),
    tables=("orders",),
)
