"""Oracle-checked queries exercising the Pandas-UDF surface (§2.11).

Only order-independent numerics go through the SQL oracle (integer-
valued sums, max−min spans, exact top-k values + integer ranks);
order-sensitive float UDAFs are tolerance-tested in
tests/test_pandas_udfs.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.functions.pandas_udfs import (
    exact_sum_udaf,
    group_topk,
    span_udaf,
)
from aws_etl_spark.queries.registry import load_table, register

_SPAN_ORACLE = """
SELECT l_returnflag,
       MAX(l_quantity) - MIN(l_quantity) AS qty_span,
       SUM(l_quantity) AS qty_sum
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "udaf_grouped_agg",
    oracle=_SPAN_ORACLE,
    category="udf",
    tables=("lineitem",),
)
def q_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDFs (span + sum; Spark disallows mixing
    pandas and non-pandas aggregates in one agg, so both are pandas).

    l_quantity is integer-valued, so the double sum is exact and
    order-independent → oracle-safe.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        span_udaf(F.col("l_quantity")).alias("qty_span"),
        exact_sum_udaf(F.col("l_quantity")).alias("qty_sum"),
    )


_TOPK_ORACLE = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
           PARTITION BY c_mktsegment
           ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rank
  FROM customer
) t WHERE rank <= 3
"""


@register(
    "grouped_map_topk",
    oracle=_TOPK_ORACLE,
    category="udf",
    tables=("customer",),
)
def q_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map top-3 per market segment — must agree
    exactly with the ROW_NUMBER window formulation (deterministic
    tiebreak on c_custkey)."""
    cust = load_table(spark, sf_dir, "customer")
    return group_topk(
        cust, ["c_mktsegment"], order_col="c_acctbal", k=3, tiebreak_col="c_custkey"
    )


_UDTF_NGRAMS_ORACLE = """
WITH w AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS ws FROM documents)
SELECT doc_id, r.i - 1 AS pos, ARRAY_TO_STRING(ws[r.i:r.i+2], ' ') AS ngram
FROM w CROSS JOIN range(1, 1001) r(i)
WHERE r.i <= LEN(ws) - 2
"""


@register(
    "udtf_word_ngrams",
    oracle=_UDTF_NGRAMS_ORACLE,
    category="udf",
    tables=("documents",),
)
def q_udtf_word_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) via LATERAL join: one doc
    row → (pos, ngram) rows. The JVM shingle pipeline
    (dedup/jaccard.py shingle_rows) is the hot path; this is the
    user-facing row-generating extension point, oracle-checked
    equivalent on the same corpus."""
    from aws_etl_spark.functions.udtfs import register_udtfs
    from aws_etl_spark.queries.registry import register_views

    register_udtfs(spark)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        "SELECT doc_id, n.pos, n.ngram "
        "FROM documents, LATERAL word_ngrams(text, 3) n"
    )
