"""Serving-layer queries: multi-sink reconciliation and plan audits.

The reference's post-load validation is a cross-store ``count(*)``
reconciliation — after writing curated parquet to S3 it counts the
Athena table and the Postgres serving copy and compares
(etl_aws_vini.py:244-256, 364-377). ``serve_reconcile`` runs that
exact contract in-engine: write the curated table to a parquet sink
AND an embedded-Derby JDBC serving sink (same ``write_jdbc``
parameterization a Postgres/Redshift load uses — only the dialect
object differs), read BOTH back, and emit per-sink reconciled row
counts plus a decimal-exact value checksum against the
recomputed-from-source expectation.

``plan_broadcast_audit`` turns the ".explain and iterate" discipline
into driver-checkable output: it plans the curated dimension chain
twice — explicit ``broadcast()`` hints vs no hints with
auto-broadcast disabled — and emits the join-strategy census mined
from each physical plan. The counts are structural (hints always win;
the no-hint side pins ``autoBroadcastJoinThreshold=-1`` during
planning), so they are scale-factor-invariant and SQL-oracleable as
literals; a pytest asserts the invariance across sf dirs.

Scale notes: the reconcile is one cached curated evaluation feeding
two distributed writes (executor-parallel parquet; per-partition JDBC
connections — the serving sink carries the per-group aggregate, which
is the set-based COPY shape, not a 100 TB row-wise insert). The audit
never executes its plans at all — it is pure planning + text mining.

Single-JVM contract (round-11 local-cluster census): the EMBEDDED
Derby URL (``jdbc:derby:/path``) is this environment's stand-in for
the reference's network warehouse, and embedded Derby is
single-process by design — under ``local-cluster[2,4,*]`` the JDBC
write task runs in a separate executor JVM that cannot boot the
driver-locked database directory ("Failed to start database"). On
any real cluster the identical ``write_jdbc`` call with a NETWORK
JDBC URL (Postgres/Redshift/derbyclient) is the correct shape —
every executor opens its own client connection, which is Spark's
normal JDBC write model. The environment ships no derbyclient jar,
so the network variant is env-gated; see SCALING.md round-11.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.io.dialects import DERBY
from aws_etl_spark.io.readers import read_jdbc
from aws_etl_spark.io.writers import write_jdbc, write_parquet
from aws_etl_spark.plans.inspect import plan_facts
from aws_etl_spark.queries.reference_parity import _DUCK_CURATED, _SPARK_CURATED
from aws_etl_spark.queries.registry import load_table, register, register_views

_CURATED_TABLES = ("orders", "customer", "nation", "region", "lineitem")

# one cached curated DataFrame per process; previous copy unpersisted
# on re-entry (same bounded-cache contract as dedup/jaccard.py)
_ACTIVE_CURATED: list[DataFrame] = []


def _serving_base(sf_dir: str) -> Path:
    """Stable per-(sf, process) scratch root: repeated invocations in
    one process (driver sweep, bench loops) overwrite in place instead
    of accreting tempdirs, while the PID suffix isolates CONCURRENT
    processes — two overlapping runs on the same sf would otherwise
    race the parquet overwrite, and the second would fail embedded
    Derby's single-JVM boot lock."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = (
        Path(tempfile.gettempdir())
        / "aws_etl_spark_serving"
        / f"{tag}-{os.getpid()}"
    )
    base.mkdir(parents=True, exist_ok=True)
    return base


def _cached_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, _CURATED_TABLES)
    while _ACTIVE_CURATED:
        try:
            _ACTIVE_CURATED.pop().unpersist()
        except Exception:
            pass  # session may be stopped; nothing to release
    cached = spark.sql(_SPARK_CURATED).cache()
    _ACTIVE_CURATED.append(cached)
    return cached


_RECONCILE_ORACLE = f"""
WITH c AS ({_DUCK_CURATED}),
e AS (
  SELECT COUNT(*) AS n, SUM(total_price) AS s FROM c
)
SELECT 'parquet' AS sink,
       CAST(n AS BIGINT) AS reconciled_rows,
       CAST(n AS BIGINT) AS expected_rows,
       1 AS rows_match,
       CAST(ROUND(s, 2) AS DOUBLE) AS reconciled_total,
       CAST(ROUND(s, 2) AS DOUBLE) AS expected_total,
       1 AS total_match
FROM e
UNION ALL
SELECT 'derby_jdbc' AS sink,
       CAST(n AS BIGINT) AS reconciled_rows,
       CAST(n AS BIGINT) AS expected_rows,
       1 AS rows_match,
       CAST(ROUND(s, 2) AS DOUBLE) AS reconciled_total,
       CAST(ROUND(s, 2) AS DOUBLE) AS expected_total,
       1 AS total_match
FROM e
"""


@register(
    "serve_reconcile",
    oracle=_RECONCILE_ORACLE,
    category="pipeline",
    tables=_CURATED_TABLES,
)
def q_serve_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write→readback→reconcile across two sinks in one plan set.

    The curated table (decimal-typed, pre-driver-wrap) is cached once,
    written to (a) a parquet lake sink and (b) a Derby JDBC serving
    sink as the per-(region, status) aggregate — the shape a warehouse
    serves, loaded through the identical ``write_jdbc`` path a
    Postgres/Redshift dialect uses (etl_aws_vini.py:307-335 parity).
    Both sinks are then READ BACK and reconciled against the
    recomputed expectation: row counts exactly, and the total_price
    checksum through exact decimal sums (order-independent) rendered
    as ROUND(x,2)::DOUBLE at the boundary. The match flags are genuine
    runtime comparisons, not literals — a dropped batch or a truncated
    decimal on either sink flips them to 0 and the driver's hash
    catches it."""
    curated = _cached_curated(spark, sf_dir)
    base = _serving_base(sf_dir)

    lake_path = str(base / "curated_parquet")
    write_parquet(curated, lake_path)

    serving = curated.groupBy("region_name", "order_status").agg(
        F.count("*").alias("order_cnt"),
        F.sum("total_price").alias("price_sum"),
    )
    derby_url = f"jdbc:derby:{base / 'servedb'};create=true"
    write_jdbc(serving, derby_url, "curated_summary", mode="overwrite",
               dialect=DERBY)

    expected = curated.agg(
        F.count("*").alias("expected_rows"),
        F.round(F.sum("total_price"), 2).cast("double").alias("expected_total"),
    )

    lake_back = spark.read.parquet(lake_path).agg(
        F.count("*").alias("reconciled_rows"),
        F.round(F.sum("total_price"), 2).cast("double")
         .alias("reconciled_total"),
    ).select(F.lit("parquet").alias("sink"), "*")

    db_back = read_jdbc(spark, derby_url, "curated_summary").agg(
        F.sum("order_cnt").cast("bigint").alias("reconciled_rows"),
        F.round(F.sum("price_sum"), 2).cast("double")
         .alias("reconciled_total"),
    ).select(F.lit("derby_jdbc").alias("sink"), "*")

    sinks = lake_back.unionByName(db_back)
    # expected is one row — broadcast-scalar cross join, the repo's
    # accepted pattern for whole-table normalizers
    out = sinks.crossJoin(F.broadcast(expected))
    return out.select(
        "sink",
        "reconciled_rows",
        "expected_rows",
        F.when(F.col("reconciled_rows") == F.col("expected_rows"), 1)
         .otherwise(0).alias("rows_match"),
        "reconciled_total",
        "expected_total",
        F.when(F.col("reconciled_total") == F.col("expected_total"), 1)
         .otherwise(0).alias("total_match"),
    )


def _curated_chain(spark: SparkSession, sf_dir: str, hinted: bool) -> DataFrame:
    """The curated dimension chain (reference variables.py:18-89 shape)
    built through the DataFrame API so the dimension sides can carry
    explicit ``broadcast()`` hints."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996, 1997)
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    returns = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_quantity", "l_shipdate")
    )
    if hinted:
        customer, nation, region, returns = (
            F.broadcast(customer), F.broadcast(nation),
            F.broadcast(region), F.broadcast(returns),
        )
    return (
        orders
        .join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(nation, customer.c_nationkey == nation.n_nationkey, "left")
        .join(region, nation.n_regionkey == region.r_regionkey, "left")
        .join(returns, orders.o_orderkey == returns.l_orderkey, "left")
        .select(
            "o_orderkey", "o_totalprice", "c_name", "n_name", "r_name",
            F.coalesce("l_quantity", F.lit(0)).alias("return_quantity"),
        )
    )


def _strategy_census(spark: SparkSession, sf_dir: str, hinted: bool) -> tuple:
    """Plan (never execute) one variant and mine its join census.

    The unhinted variant pins ``autoBroadcastJoinThreshold=-1`` during
    planning (restored after) so the census is decided by hints alone,
    not by file-size statistics — that is what makes the counts
    scale-factor-invariant and therefore oracle-able."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    try:
        if not hinted:
            spark.conf.set(key, "-1")
        facts = plan_facts(_curated_chain(spark, sf_dir, hinted))
    finally:
        spark.conf.set(key, prev)
    strategies = facts.join_strategies
    return (
        "hinted" if hinted else "no_hints",
        strategies.count("BroadcastHashJoin"),
        strategies.count("SortMergeJoin"),
        facts.n_broadcast_exchanges,
        facts.n_exchanges,
    )


_AUDIT_ORACLE = """
SELECT 'hinted' AS mode,
       CAST(4 AS INT) AS broadcast_hash_joins,
       CAST(0 AS INT) AS sort_merge_joins,
       CAST(4 AS INT) AS broadcast_exchanges,
       CAST(0 AS INT) AS shuffle_exchanges
UNION ALL
SELECT 'no_hints' AS mode,
       CAST(0 AS INT) AS broadcast_hash_joins,
       CAST(4 AS INT) AS sort_merge_joins,
       CAST(0 AS INT) AS broadcast_exchanges,
       CAST(8 AS INT) AS shuffle_exchanges
"""


@register(
    "plan_broadcast_audit",
    oracle=_AUDIT_ORACLE,
    category="pipeline",
    tables=_CURATED_TABLES,
)
def q_plan_broadcast_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy census of the curated chain, hinted vs unhinted.

    Proves the SURVEY §4 claim ("every dimension join broadcasts under
    hints; without them the same chain is 4 sort-merge joins shuffling
    both sides") as driver-checkable rows instead of prose: 4 BHJ / 0
    shuffles hinted vs 0 BHJ / 8 shuffle exchanges (both sides × 4
    joins) unhinted. Plans are built and mined, never executed —
    at 100 TB this audit costs exactly what it costs at sf0.001,
    which is also why the oracle can be a literal table."""
    rows = [
        _strategy_census(spark, sf_dir, hinted=True),
        _strategy_census(spark, sf_dir, hinted=False),
    ]
    from aws_etl_spark.ops.scale import bounded_rows_df

    return bounded_rows_df(
        spark,
        rows,
        "mode string, broadcast_hash_joins int, sort_merge_joins int, "
        "broadcast_exchanges int, shuffle_exchanges int",
    )
