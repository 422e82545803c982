"""Incremental-maintenance queries: MERGE upsert and hourly→daily
rollup of partials, both fully SQL-oracled."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.ops.incremental import rollup_partials, upsert
from aws_etl_spark.queries.registry import load_table, register
from aws_etl_spark.streaming.windows import tumbling_counts

_UPSERT_ORACLE = """
WITH updates AS (
  SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM updates
UNION ALL
SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment
FROM customer t
WHERE t.c_custkey NOT IN (SELECT c_custkey FROM updates)
"""


@register(
    "merge_upsert",
    oracle=_UPSERT_ORACLE,
    category="incremental",
    tables=("customer",),
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics: every 10th customer gets an updated balance;
    the rest pass through untouched (anti-join + union, one shuffle)."""
    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    return upsert(cust, updates, ["c_custkey"])


_PROFILE_ORACLE = """
SELECT 'o_orderkey' AS column, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_orderkey) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
"""


@register(
    "table_profile",
    oracle=_PROFILE_ORACLE,
    category="incremental",
    tables=("orders",),
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profiling (ANALYZE TABLE as a query)."""
    from aws_etl_spark.ops.quality import profile

    orders = load_table(spark, sf_dir, "orders")
    return profile(orders, ["o_orderkey", "o_orderstatus", "o_custkey"])


_ROLLUP_ORACLE = """
WITH hourly AS (
  SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS window_start,
         event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events
  GROUP BY 1, 2
)
SELECT DATE_TRUNC('day', window_start) AS day,
       event_type,
       CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(CAST(total_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM hourly
GROUP BY 1, 2
"""


@register(
    "events_rollup_daily",
    oracle=_ROLLUP_ORACLE,
    category="streaming",
    tables=("events",),
)
def q_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pattern: daily view folded from the HOURLY
    partials (never re-scans raw events — counts add, decimal-routed
    sums add exactly)."""
    events = load_table(spark, sf_dir, "events")
    hourly = tumbling_counts(events, window="1 hour")
    daily = rollup_partials(
        hourly.withColumn(
            "total_value", F.col("total_value").cast("decimal(18,2)")
        ).withColumn("day", F.date_trunc("day", "window_start")),
        ["day", "event_type"],
        sum_cols=["total_value"],
        count_cols=["n"],
    )
    return daily.select(
        "day", "event_type", "n", F.col("total_value").cast("double").alias("total_value")
    )


_SK_ORACLE = """
SELECT n_name, n_regionkey,
       CAST(ROW_NUMBER() OVER (ORDER BY n_nationkey) AS BIGINT) AS sk
FROM nation
"""


@register(
    "surrogate_keys",
    oracle=_SK_ORACLE,
    category="incremental",
    tables=("nation",),
)
def q_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered surrogate keys (deterministic tier; see ops/keys.py for
    the shuffle-free contiguous and zero-cost sparse tiers)."""
    from aws_etl_spark.ops.keys import with_ordered_ids

    nation = load_table(spark, sf_dir, "nation")
    return with_ordered_ids(nation, ["n_nationkey"]).select(
        "n_name", "n_regionkey", F.col("sk").cast("bigint").alias("sk")
    )


_SCD2_ORACLE = """
WITH h AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS prev_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS rn
  FROM events WHERE user_id < 100
),
v AS (
  SELECT user_id, ts, event_type FROM h
  WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL AS is_current
FROM v
"""


@register(
    "scd2_dimension",
    oracle=_SCD2_ORACLE,
    category="incremental",
    tables=("events",),
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD intervals from the event history: per-user
    event_type 'versions' with validity ranges, no-change rows
    collapsed."""
    from aws_etl_spark.ops.incremental import scd2_from_history

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    return scd2_from_history(events, ["user_id"], "ts", ["event_type"])


_RANGE_JOIN_ORACLE = """
WITH iv AS (
  SELECT user_id AS id,
         CAST(FLOOR(MIN(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS t_start,
         CAST(FLOOR(MAX(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS t_end
  FROM events WHERE user_id < 200 GROUP BY user_id
)
SELECT a.id AS l_id, b.id AS r_id,
       a.t_start AS l_start, a.t_end AS l_end,
       b.t_start AS r_start, b.t_end AS r_end
FROM iv a JOIN iv b
  ON a.t_start < b.t_end AND b.t_start < a.t_end AND a.id < b.id
"""


@register(
    "join_range_overlap",
    oracle=_RANGE_JOIN_ORACLE,
    category="join",
    tables=("events",),
)
def q_range_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via bin bucketing (linear equi-join on
    bin id + exact verify), vs the oracle's naive theta join. Intervals
    = each user's [first, last] event time."""
    from aws_etl_spark.ops.range_join import range_overlap_join

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    iv = events.groupBy(F.col("user_id").alias("id")).agg(
        F.unix_timestamp(F.min("ts")).alias("t_start"),
        F.unix_timestamp(F.max("ts")).alias("t_end"),
    )
    pairs = range_overlap_join(
        iv, iv, ("id", "t_start", "t_end"), ("id", "t_start", "t_end"),
        bin_width=86_400,
    )
    return pairs.filter(F.col("l_id") < F.col("r_id"))


_DICT_ORACLE = """
WITH d AS (
  SELECT o_orderpriority AS value,
         CAST(ROW_NUMBER() OVER (ORDER BY o_orderpriority) AS INT) AS code
  FROM (SELECT DISTINCT o_orderpriority FROM orders WHERE o_orderpriority IS NOT NULL)
)
SELECT o.o_orderkey, d.code AS o_orderpriority_code
FROM orders o LEFT JOIN d ON o.o_orderpriority = d.value
"""


@register(
    "dictionary_encoding",
    oracle=_DICT_ORACLE,
    category="incremental",
    tables=("orders",),
)
def q_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encode o_orderpriority (dense codes by value order,
    broadcast join back — the fact side never shuffles)."""
    from aws_etl_spark.ops.incremental import encode_dictionary

    orders = load_table(spark, sf_dir, "orders")
    encoded, _ = encode_dictionary(orders, "o_orderpriority")
    return encoded.select("o_orderkey", "o_orderpriority_code")


def _bloom_oracle() -> str:
    """Oracle text with the SAME universal-hash coefficients the
    library derives from seed 42 — embedded as literals so DuckDB
    computes the bit-identical bitmap."""
    from aws_etl_spark.ops.bloom import _P, _coeffs

    rows = ", ".join(f"({a}, {b})" for a, b in _coeffs(5, 42))
    return f"""
WITH coeffs(a, b) AS (VALUES {rows}),
fkeys AS (
  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
),
bpos AS (
  SELECT (((k % {_P}) * a + b) % {_P}) % 131072 AS pos
  FROM fkeys CROSS JOIN coeffs
),
bitmap AS (
  SELECT pos // 32 AS word_idx,
         BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
  FROM bpos GROUP BY 1
),
probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
ppos AS (
  SELECT k,
         (((k % {_P}) * a + b) % {_P}) % 131072 AS pos
  FROM probe CROSS JOIN coeffs
),
pw AS (
  SELECT k, pos // 32 AS word_idx,
         CAST(1 AS BIGINT) << CAST(pos % 32 AS INT) AS bit
  FROM ppos
),
hit AS (
  SELECT k, BOOL_AND((COALESCE(bits, 0) & bit) <> 0) AS might_contain
  FROM pw LEFT JOIN bitmap USING (word_idx) GROUP BY k
)
SELECT h.k AS l_orderkey, h.might_contain,
       (m.k IS NOT NULL) AS is_member
FROM hit h
LEFT JOIN fkeys m ON h.k = m.k
"""


@register(
    "bloom_filter_membership",
    oracle=_bloom_oracle(),
    category="incremental",
    tables=("orders", "lineitem"),
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom filter (sketch family, next to HLL): bitmap
    built over 'F'-status orderkeys via bit_or aggregation, lineitem
    keys probed through a broadcast join. Universal integer hashing
    makes the bitmap bit-identical in DuckDB, so even the false
    positives hash-match the oracle. No false negatives by
    construction: is_member → might_contain."""
    from aws_etl_spark.ops.bloom import bloom_build, bloom_probe

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    fkeys = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    bitmap = bloom_build(fkeys, "o_orderkey", m_bits=1 << 17, k=5, seed=42)
    probe = lineitem.select(F.col("l_orderkey")).distinct()
    probed = bloom_probe(probe, "l_orderkey", bitmap, m_bits=1 << 17, k=5, seed=42)
    members = fkeys.distinct().withColumn("is_member", F.lit(True))
    return (
        probed.join(
            members.withColumnRenamed("o_orderkey", "l_orderkey"),
            "l_orderkey",
            "left",
        )
        .select(
            "l_orderkey",
            "might_contain",
            F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
        )
    )


_TABLE_DIFF_ORACLE = """
WITH l AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
r AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 103 = 0
),
j AS (
  SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
         l.o_orderkey IS NOT NULL AS in_l,
         r.o_orderkey IS NOT NULL AS in_r,
         (l.o_totalprice IS DISTINCT FROM r.o_totalprice)
         OR (l.o_orderstatus IS DISTINCT FROM r.o_orderstatus) AS diff
  FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN NOT in_l THEN 'added'
            WHEN NOT in_r THEN 'removed'
            WHEN diff THEN 'changed'
            ELSE 'same' END AS status
FROM j
"""


@register(
    "table_diff_reconcile",
    oracle=_TABLE_DIFF_ORACLE,
    category="incremental",
    tables=("orders",),
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: key-level added/removed/changed/same
    between two table versions (the right side derived deterministically
    — keys %101 removed, %97 repriced, %103 re-keyed as inserts). The
    reference validates cross-store loads by COUNT alone
    (etl_aws_vini.py:566-585); this is the key+value upgrade. One full
    outer join = one shuffle per side; null-safe comparison."""
    from aws_etl_spark.ops.quality import table_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    right = orders.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    added = orders.filter(F.col("o_orderkey") % 103 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
    )
    return table_diff(
        orders, right.unionByName(added), ["o_orderkey"]
    )


_IVM_ORACLE = """
SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register(
    "events_rollup_incremental",
    oracle=_IVM_ORACLE,
    category="incremental",
    tables=("events",),
)
def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for an aggregate: a materialized
    daily rollup (built from 90% of events, localCheckpoint standing
    in for the stored table) is brought up to date by MERGING a delta
    batch's partial aggregate — full-outer join on the group key,
    counts and exact-decimal sums coalesce-add, groups new in the
    delta appear, groups untouched pass through. The oracle is the
    full recompute over all events: the green hash row proves
    maintain(state, delta) == recompute(base ∪ delta), the IVM
    property that lets a 100 TB pipeline update a continuous
    aggregate for the cost of the delta instead of the corpus.

    The base/delta split (event_id mod 10) is deterministic so both
    engines see the same partition of rows."""
    events = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
        "event_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )

    def daily(df: DataFrame) -> DataFrame:
        return df.groupBy("day", "event_type").agg(
            F.count("*").alias("n"), F.sum("v").alias("tv")
        )

    state = daily(events.filter(F.pmod("event_id", F.lit(10)) != 0)).localCheckpoint()
    delta = daily(events.filter(F.pmod("event_id", F.lit(10)) == 0))
    s = state.select("day", "event_type", F.col("n").alias("n_s"), F.col("tv").alias("tv_s"))
    d = delta.select("day", "event_type", F.col("n").alias("n_d"), F.col("tv").alias("tv_d"))
    merged = s.join(d, ["day", "event_type"], "full_outer")
    zero = F.lit(0).cast("decimal(18,2)")
    return merged.select(
        "day",
        "event_type",
        (F.coalesce("n_s", F.lit(0)) + F.coalesce("n_d", F.lit(0)))
        .cast("bigint")
        .alias("n"),
        # NULL-aware add: SUM over an all-NULL group is NULL on both
        # engines, and the merged state must preserve that (coalescing
        # both-NULL to 0.00 would diverge from the full recompute)
        F.when(
            F.col("tv_s").isNull() & F.col("tv_d").isNull(), F.lit(None)
        )
        .otherwise(F.coalesce(F.col("tv_s"), zero) + F.coalesce(F.col("tv_d"), zero))
        .cast("double")
        .alias("total_value"),
    )
