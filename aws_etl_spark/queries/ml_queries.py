"""ML training-data assembly operators: leakage-free feature joins
and deterministic negative sampling.

These are the two joins every supervised pipeline over event data
needs and every naive implementation gets wrong:

* **Point-in-time correctness** — a training example's features must
  be computed ONLY from data before the label's timestamp ("as known
  at T"); joining current aggregates leaks the future into training.
* **Reproducible negative sampling** — contrastive/ranking training
  needs per-user negatives that are deterministic (re-runs build the
  same corpus), exclude positives, and never enumerate the full
  user × catalog cross product.
"""

from __future__ import annotations

from fractions import Fraction

from aws_etl_spark.ops.corpus import duckdb_bucket_sql
from aws_etl_spark.queries.registry import register, sql_query, staged_sql_query
from aws_etl_spark.queries.sql_seams import spark_declared

# --------------------------------------------------------------------------
# Point-in-time feature join. One user-partitioned window, ordered by
# (ts, event_id) — the unique tiebreak makes the "strictly prior"
# frame deterministic even at equal timestamps — with the frame ROWS
# UNBOUNDED PRECEDING .. 1 PRECEDING, so the label row's own event
# can never contribute to its features. Window parallelism grows with
# the user count (the 100 TB shape); value cents are FLOOR(value*100)
# per row — a single portable IEEE op — so the running sums are exact
# BIGINTs. Identical text on both engines.
# --------------------------------------------------------------------------

_PIT_SQL = """
WITH ev AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN value IS NOT NULL
              THEN CAST(FLOOR(value * 100) AS BIGINT) END AS v_cents
  FROM events
),
feat AS (
  SELECT user_id, ts, event_type, event_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS n_prior_events,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS n_prior_purchases,
         SUM(v_cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior_value_cents
  FROM ev
)
SELECT event_id AS label_event_id, user_id, ts AS label_ts,
       CAST(COALESCE(n_prior_events, 0) AS BIGINT) AS n_prior_events,
       CAST(COALESCE(n_prior_purchases, 0) AS BIGINT) AS n_prior_purchases,
       CAST(COALESCE(prior_value_cents, 0) AS BIGINT) AS prior_value_cents
FROM feat WHERE event_type = 'purchase'
"""

sql_query(
    "ml_pointintime_features",
    _PIT_SQL,
    category="ml",
    doc=(
        "Leakage-free training-feature join: for every purchase label, "
        "per-user feature aggregates over STRICTLY PRIOR events (frame "
        "ends at 1 PRECEDING; (ts, event_id) ordering makes equal-"
        "timestamp frames deterministic). The feature-store "
        "point-in-time-correct join as one user-partitioned window — "
        "no as-of self-join, no current-state leak."
    ),
    tables=("events",),
)


# --------------------------------------------------------------------------
# Deterministic negative sampling. Candidates come from a hash-shard
# join — customer's md5-coin shard against partkey % NS — so each
# customer scores catalog/NS items instead of the full catalog (the
# anti-cross-product dial; NS grows with catalog size). Positives are
# removed by anti-join inside the slice, and the kept negatives are
# the k lowest (coin, partkey) — a pure function of the keys, so
# re-runs and both engines produce the identical sample. No RNG state
# anywhere (the salted-md5-coin contract shared with corpus
# splitting/sampling).
# --------------------------------------------------------------------------

# Shard count: each customer scores ~catalog/NS candidate items. NS
# is DERIVED FROM THE CATALOG at runtime (a scalar subquery both
# engines evaluate identically) so per-user candidate work stays
# ~SLICE_TARGET as the catalog grows — a fixed NS makes total
# candidates grow as users x catalog, which the 10x study measured
# as a 98x cliff before this dial became adaptive. At toy scale NS
# degrades to 1 (score the whole catalog) — the exact small-corpus
# semantics.
_SLICE_TARGET = 300


def _digit(h: str, i: int) -> str:
    return f"(strpos('0123456789abcdef', substr({h},{i},1))-1)"


def _duck_coin(key: str) -> str:
    h = f"md5({key})"
    terms = " + ".join(
        _digit(h, i) + f"*{16 ** (4 - i)}" for i in range(1, 5)
    )
    return f"({terms})"


_SPARK_PAIR_COIN = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT(CAST(c.custkey AS STRING), '#', "
    "CAST(p.p_partkey AS STRING))), 1, 4), 16, 10) AS BIGINT)"
)
_DUCK_PAIR_COIN = _duck_coin(
    "CAST(c.custkey AS VARCHAR) || '#' || CAST(p.p_partkey AS VARCHAR)"
)
_SPARK_CUST_COIN = (
    "CAST(CONV(SUBSTRING(MD5(CAST(c.custkey AS STRING)), 1, 4), 16, 10)"
    " AS BIGINT)"
)
_DUCK_CUST_COIN = _duck_coin("CAST(c.custkey AS VARCHAR)")


def _neg_sql(pair_coin: str, cust_coin: str) -> str:
    return f"""
WITH pos AS (
  -- NOT deduplicated: the anti-join below is insensitive to
  -- duplicate positives, and the DISTINCT was the query's single
  -- most expensive stage (a full shuffle of the interaction join)
  SELECT o.o_custkey AS custkey, l.l_partkey AS partkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
ns AS (
  -- FLOOR of a double division (identical IEEE op both engines; a
  -- bare CAST would truncate on Spark but ROUND on DuckDB)
  SELECT GREATEST(1, CAST(FLOOR(COUNT(*) / {_SLICE_TARGET}.0) AS BIGINT))
           AS ns
  FROM part
),
cust AS (
  SELECT c.custkey, ({cust_coin}) % ns.ns AS shard
  FROM (SELECT DISTINCT o_custkey AS custkey FROM orders) c
  CROSS JOIN ns
),
parts AS (
  SELECT p.p_partkey, p.p_partkey % ns.ns AS shard
  FROM part p CROSS JOIN ns
),
cand AS (
  -- second dial: only coins in the lowest quarter of the range can
  -- ever win a top-2 slot at realistic slice sizes, so the bulk of
  -- the slice is dropped BEFORE the anti-join and ranking stages
  -- (both engines apply the identical cut; at toy scale a user's
  -- whole slice can fall above it and that user samples fewer
  -- negatives — deterministically on both sides)
  SELECT * FROM (
    SELECT c.custkey, p.p_partkey AS partkey, {pair_coin} AS coin
    FROM cust c JOIN parts p ON p.shard = c.shard
  ) WHERE coin < 16384
),
neg AS (
  SELECT cand.custkey, cand.partkey, cand.coin
  FROM cand LEFT JOIN pos
    ON pos.custkey = cand.custkey AND pos.partkey = cand.partkey
  WHERE pos.custkey IS NULL
),
ranked AS (
  SELECT custkey, partkey, coin,
         ROW_NUMBER() OVER (PARTITION BY custkey
                            ORDER BY coin, partkey) AS rn
  FROM neg
)
SELECT custkey, partkey AS negative_partkey,
       CAST(coin AS BIGINT) AS coin, CAST(rn AS BIGINT) AS sample_rank
FROM ranked WHERE rn <= 2
"""


def _neg_sampling_fn(spark, sf_dir):
    """Single-scan realization of the negative-sampling plan.

    The r8 SQL form let Catalyst inline the CTE chain: its executed
    plan re-read the same base relations into 6 parquet scans / 10
    exchanges (``pos``/``cust`` each re-derived orders, ``parts``/
    ``ns`` each re-derived part, and ``ns`` was recomputed per
    consumer). Here each base relation is scanned ONCE:

    * ``orders`` → a 2-column (custkey, orderkey) projection,
      localCheckpoint'ed, feeding BOTH the positives join and the
      distinct-customer slice — the optimizer cannot inline a
      materialized RDD back into two scans;
    * ``part`` → one data scan (the shard table); ``ns`` (the
      adaptive shard count) is a driver-side scalar from a separate
      zero-column count job, hoisted into the plan as a literal
      instead of a per-consumer scalar subquery.

    At 100 TB the checkpoints hold pruned integer projections (the
    narrow columns the query touches anyway), traded against a second
    full parquet scan of each base — the same discipline
    ``corpus_e2e_pipeline`` proved. The shard join is left unhinted:
    AQE broadcasts the checkpointed key table at any realistic
    catalog size and falls back to the shard equi-join shuffle beyond
    broadcast range. Executed-plan shape is pinned by
    ``tests/test_plans.py`` (≤3 parquet scans, ≤5 shuffle exchanges).
    """
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_etl_spark.queries.registry import load_table

    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
        )
        .localCheckpoint(eager=True)
    )
    part_keys = load_table(spark, sf_dir, "part").select("p_partkey")
    # adaptive shard count (see _neg_sql's ns CTE): FLOOR of a double
    # division, identical to the oracle's GREATEST(1, FLOOR(n/300.0)).
    # The count is its own zero-column job (parquet row-group counts),
    # cheaper than checkpointing the key column just to count it; the
    # shard table below is then part's ONLY data scan in the main plan.
    ns = max(1, int(math.floor(part_keys.count() / float(_SLICE_TARGET))))

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_partkey").alias("partkey"),
    )
    # positives deliberately NOT deduplicated (the anti-join below is
    # insensitive to duplicates; the DISTINCT was the query's single
    # most expensive stage in r7)
    pos = orders.join(lineitem, "orderkey").select("custkey", "partkey")

    cust_coin = _SPARK_CUST_COIN.replace("c.custkey", "custkey")
    # Explicit-width ROUND-ROBIN repartition after the distinct: the
    # distinct's shuffle output is tiny (one row per customer) so AQE
    # coalesces it to ~1 partition — but the shard join below fans
    # each row out ~SLICE_TARGET× and evaluates two md5 coins per
    # candidate, work AQE cannot see at planning time (the
    # explode-after-coalesce trap; single-threaded it was this
    # query's whole budget). It must be round-robin with an explicit
    # count: a KEYED repartition on custkey collapses into the
    # distinct's own ENSURE_REQUIREMENTS exchange, which AQE then
    # coalesces anyway (measured: the whole fan-out ran on 1 core).
    cust = (
        orders.select("custkey")
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("shard", F.expr(cust_coin) % F.lit(ns))
    )
    parts = part_keys.select(
        F.col("p_partkey").alias("partkey"),
        (F.col("p_partkey") % F.lit(ns)).alias("shard"),
    )
    pair_coin = _SPARK_PAIR_COIN.replace("c.custkey", "custkey").replace(
        "p.p_partkey", "partkey"
    )
    cand = (
        cust.join(parts, "shard")
        .withColumn("coin", F.expr(pair_coin))
        .filter(F.col("coin") < 16384)
    )
    neg = cand.join(pos, ["custkey", "partkey"], "left_anti")
    w = Window.partitionBy("custkey").orderBy("coin", "partkey")
    return (
        neg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "custkey",
            F.col("partkey").alias("negative_partkey"),
            F.col("coin").cast("bigint").alias("coin"),
            F.col("rn").cast("bigint").alias("sample_rank"),
        )
    )


register(
    "ml_negative_sampling",
    oracle=_neg_sql(_DUCK_PAIR_COIN, _DUCK_CUST_COIN),
    category="ml",
    doc=(
        "Deterministic per-user negative sampling for ranking/"
        "contrastive training: candidates from an md5-coin shard join "
        "(the shard count adapts to catalog size so each customer "
        "scores ~300 candidates at ANY scale, never the cross product), "
        "positives anti-joined away inside the slice, k=2 negatives "
        "kept by lowest (coin, partkey) — fully reproducible, no RNG "
        "state, hash-proven against DuckDB's decode of the same md5 "
        "coins. Round 9: restructured from the SQL CTE form to a "
        "single scan per base relation (6 scans/10 exchanges → ≤3/≤5)."
    ),
    tables=("orders", "lineitem", "part"),
)(_neg_sampling_fn)


# --------------------------------------------------------------------------
# Weight-of-evidence feature binning — the classic supervised
# discretization for scorecard/GBM features: equi-depth decile bins of
# a continuous feature, per-bin WOE = ln(good_rate/bad_rate) and the
# information-value contribution. Reuses the drift monitors' proven
# portable machinery end to end: the feature is exact integer cents,
# bin edges are exact ORDER STATISTICS located by integer cumulative
# counts over the two-stage prefix sum (no percentile interpolation),
# counts stay BIGINT, and the only IEEE op is one LN over an exact
# integer ratio, micro-quantized at the output boundary.
#
# Laplace(+1 good/bad, +10 totals) smoothing keeps empty bins finite —
# the same convention as the PSI monitors, so the numbers compose.
# Scale shape: one per-value reduce (map-side combined), bounded
# bucket-spine windows inside the declared-single-partition seam, a
# 9-row broadcast edge table, constant-size finish.
# --------------------------------------------------------------------------


def _woe_sql(intdiv, bins_clause: str, declared) -> str:
    return f"""
WITH v0 AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS good
  FROM orders
),
n AS (
  SELECT CAST(SUM(good) AS BIGINT) AS ng,
         CAST(SUM(1 - good) AS BIGINT) AS nb,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM v0
),
g AS (
  SELECT v, {intdiv("v", "5000000")} AS bucket,
         CAST(SUM(good) AS BIGINT) AS cg,
         CAST(SUM(1 - good) AS BIGINT) AS cb,
         CAST(COUNT(*) AS BIGINT) AS ct
  FROM v0 GROUP BY v
),
bt AS (
  SELECT bucket, CAST(SUM(ct) AS BIGINT) AS bct FROM g GROUP BY bucket
),
off AS (
  SELECT bucket,
         CAST(COALESCE(SUM(bct) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o
  FROM {declared("bt")}
),
cum AS (
  SELECT g.v, g.cg, g.cb,
         o.o + SUM(g.ct) OVER (PARTITION BY g.bucket ORDER BY g.v
               ROWS UNBOUNDED PRECEDING) AS f
  FROM g JOIN off o ON o.bucket = g.bucket
),
ks AS (SELECT CAST(kk.k AS BIGINT) AS k FROM ({bins_clause}) kk),
edges AS (
  SELECT ks.k, MIN(cum.v) AS edge_v
  FROM ks CROSS JOIN n
  JOIN cum ON cum.f >= {intdiv("ks.k * n.nt + 9", "10")}
  GROUP BY ks.k
),
binned AS (
  SELECT cum.v, cum.cg, cum.cb,
         CAST(COALESCE(SUM(CASE WHEN e.edge_v < cum.v THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS bin
  FROM cum LEFT JOIN edges e ON e.edge_v < cum.v
  GROUP BY cum.v, cum.cg, cum.cb
),
bc AS (
  SELECT bin, CAST(SUM(cg) AS BIGINT) AS goods,
         CAST(SUM(cb) AS BIGINT) AS bads
  FROM binned GROUP BY bin
),
spine AS (SELECT CAST(kk.k AS BIGINT) - 1 AS bin FROM ({bins_clause}) kk
          UNION ALL SELECT CAST(9 AS BIGINT)),
grid AS (
  SELECT s.bin, COALESCE(bc.goods, 0) AS goods, COALESCE(bc.bads, 0) AS bads
  FROM spine s LEFT JOIN bc ON bc.bin = s.bin
),
t AS (
  SELECT g2.bin, g2.goods, g2.bads,
         (g2.goods + 1) * (n.nb + 10) - (g2.bads + 1) * (n.ng + 10) AS dnum,
         CAST(FLOOR(LN(CAST((g2.goods + 1) * (n.nb + 10) AS DOUBLE) /
                       CAST((g2.bads + 1) * (n.ng + 10) AS DOUBLE)) * 1000000)
              AS BIGINT) AS woe_q6,
         n.ng, n.nb
  FROM grid g2 CROSS JOIN n
),
s AS (SELECT CAST(SUM(dnum * woe_q6) AS BIGINT) AS tot FROM t)
SELECT t.bin, t.goods, t.bads, t.woe_q6,
       CAST(t.dnum * t.woe_q6 AS BIGINT) AS iv_contrib_q6,
       CAST(s.tot AS DOUBLE) /
       (CAST(t.ng + 10 AS DOUBLE) * CAST(t.nb + 10 AS DOUBLE)) /
       1000000.0 AS information_value
FROM t CROSS JOIN s
ORDER BY t.bin
"""


def _woe_spark() -> str:
    from aws_etl_spark.queries.sql_seams import spark_declared

    return _woe_sql(
        lambda a, b: f"({a}) DIV ({b})",
        "SELECT explode(sequence(1, 9)) AS k",
        spark_declared,
    )


def _woe_duck() -> str:
    from aws_etl_spark.queries.sql_seams import duck_declared

    return _woe_sql(
        lambda a, b: f"({a}) // ({b})",
        "SELECT unnest(generate_series(1, 9)) AS k",
        duck_declared,
    )


staged_sql_query(
    "ml_feature_binning_woe",
    # Round-10 rescan fix: the single-statement form re-derived the
    # v0/g/cum chain into 12 logical orders scans / 34 exchanges.
    # Staged exactly like stat_psi_equidepth (the two share the
    # order-statistic binning machinery): the per-value rollup g (ONE
    # orders scan) and the cumulative count cum are checkpointed; the
    # good/bad/total counts become driver literals.
    ops=(
        (
            "view",
            "woe_g",
            """
            SELECT v, (v) DIV (5000000) AS bucket,
                   CAST(SUM(good) AS BIGINT) AS cg,
                   CAST(SUM(1 - good) AS BIGINT) AS cb,
                   CAST(COUNT(*) AS BIGINT) AS ct
            FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                              AS BIGINT) AS v,
                         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END AS good
                  FROM orders)
            GROUP BY v
            """,
        ),
        (
            "scalars",
            ("WOENG", "WOENB", "WOENT"),
            "SELECT CAST(SUM(cg) AS BIGINT), CAST(SUM(cb) AS BIGINT),"
            " CAST(SUM(ct) AS BIGINT) FROM woe_g",
        ),
        (
            "view",
            "woe_cum",
            f"""
            WITH bt AS (
              SELECT bucket, CAST(SUM(ct) AS BIGINT) AS bct
              FROM woe_g GROUP BY bucket
            ),
            off AS (
              SELECT bucket,
                     CAST(COALESCE(SUM(bct) OVER (PARTITION BY __g
                          ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS o
              FROM {spark_declared("bt")}
            )
            SELECT g.v, g.cg, g.cb,
                   o.o + SUM(g.ct) OVER (PARTITION BY g.bucket
                         ORDER BY g.v ROWS UNBOUNDED PRECEDING) AS f
            FROM woe_g g JOIN off o ON o.bucket = g.bucket
            """,
        ),
    ),
    final="""
    WITH ks AS (
      SELECT CAST(kk.k AS BIGINT) AS k
      FROM (SELECT explode(sequence(1, 9)) AS k) kk
    ),
    edges AS (
      SELECT ks.k, MIN(cum.v) AS edge_v
      FROM ks JOIN woe_cum cum
        ON cum.f >= (ks.k * {WOENT} + 9) DIV (10)
      GROUP BY ks.k
    ),
    binned AS (
      SELECT cum.v, cum.cg, cum.cb,
             CAST(COALESCE(SUM(CASE WHEN e.edge_v < cum.v THEN 1 ELSE 0 END),
                  0) AS BIGINT) AS bin
      FROM woe_cum cum LEFT JOIN edges e ON e.edge_v < cum.v
      GROUP BY cum.v, cum.cg, cum.cb
    ),
    bc AS (
      SELECT bin, CAST(SUM(cg) AS BIGINT) AS goods,
             CAST(SUM(cb) AS BIGINT) AS bads
      FROM binned GROUP BY bin
    ),
    spine AS (
      SELECT CAST(kk.k AS BIGINT) - 1 AS bin
      FROM (SELECT explode(sequence(1, 9)) AS k) kk
      UNION ALL SELECT CAST(9 AS BIGINT)
    ),
    grid AS (
      SELECT s.bin, COALESCE(bc.goods, 0) AS goods,
             COALESCE(bc.bads, 0) AS bads
      FROM spine s LEFT JOIN bc ON bc.bin = s.bin
    ),
    t AS (
      SELECT g2.bin, g2.goods, g2.bads,
             (g2.goods + 1) * ({WOENB} + 10) - (g2.bads + 1) * ({WOENG} + 10)
               AS dnum,
             CAST(FLOOR(LN(CAST((g2.goods + 1) * ({WOENB} + 10) AS DOUBLE) /
                           CAST((g2.bads + 1) * ({WOENG} + 10) AS DOUBLE))
                  * 1000000) AS BIGINT) AS woe_q6
      FROM grid g2
    ),
    s AS (SELECT CAST(SUM(dnum * woe_q6) AS BIGINT) AS tot FROM t)
    SELECT t.bin, t.goods, t.bads, t.woe_q6,
           CAST(t.dnum * t.woe_q6 AS BIGINT) AS iv_contrib_q6,
           CAST(s.tot AS DOUBLE) /
           (CAST({WOENG} + 10 AS DOUBLE) * CAST({WOENB} + 10 AS DOUBLE)) /
           1000000.0 AS information_value
    FROM t CROSS JOIN s
    ORDER BY t.bin
    """,
    oracle=_woe_duck(),
    category="ml",
    doc=(
        "Weight-of-evidence feature binning: order totalprice (exact "
        "cents) cut into equi-depth deciles whose edges are exact "
        "order statistics (integer cumulative counts over the "
        "two-stage prefix sum), label = urgent/high priority; per-bin "
        "Laplace-smoothed WOE = ln(good_rate/bad_rate) micro-"
        "quantized plus exact-integer information-value contributions "
        "and the total IV. The supervised discretization pass feature "
        "pipelines run before scorecards/GBMs."
    ),
    tables=("orders",),
)


# --------------------------------------------------------------------------
# Feature hashing (the hashing trick, Weinberger et al. 2009): map an
# unbounded categorical vocabulary into a FIXED 64-bucket feature
# space with a signed hash — bucket = md5 coin % 64, sign from the
# next coin bit — so downstream models take a constant-width vector
# regardless of vocabulary growth, and collisions cancel in
# expectation instead of biasing up. Features here are the customer's
# (nation, segment) one-hot pairs; output = the 64-bucket hashed
# aggregate plus the collision audit (distinct original features per
# bucket) a feature pipeline must watch. One scan, one 64-row agg;
# vocabulary size never enters the plan.
# --------------------------------------------------------------------------

def _feat_hash_sql(bucket, vchar: str, intmod, intdiv) -> str:
    key = f"CONCAT('nat=', CAST(c_nationkey AS {vchar}), ':seg=', c_mktsegment)"
    coin = bucket(key)
    # ONE md5 per row: bucket from bits 0-5 of the 16-bit coin, sign
    # from bit 6 of the same coin (independent bits of one hash — the
    # per-coin-md5 variant is the 2x cost stat_bootstrap_ci measured)
    b = intmod("c", "64")
    sign = f"CASE WHEN {intmod(intdiv('c', '64'), '2')} = 0 THEN 1 ELSE -1 END"
    return f"""
WITH coins AS (
  SELECT {key} AS f, {coin} AS c FROM customer
),
feat AS (
  SELECT f, CAST({b} AS BIGINT) AS bucket,
         CAST({sign} AS BIGINT) AS sgn
  FROM coins
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT f) AS BIGINT) AS n_features,
       CAST(SUM(sgn) AS BIGINT) AS signed_sum
FROM feat
GROUP BY bucket
"""


sql_query(
    "ml_feature_hashing",
    _feat_hash_sql(
        lambda k: f"CAST(CONV(SUBSTRING(MD5({k}), 1, 4), 16, 10) AS INT)",
        "STRING",
        lambda a, b: f"({a}) % ({b})",
        lambda a, b: f"({a}) DIV ({b})",
    ),
    oracle=_feat_hash_sql(
        duckdb_bucket_sql,
        "VARCHAR",
        lambda a, b: f"({a}) % ({b})",
        lambda a, b: f"({a}) // ({b})",
    ),
    category="ml",
    doc=(
        "Feature hashing (the hashing trick): (nation, segment) "
        "one-hot features signed-hashed into a fixed 64-bucket space "
        "via md5 coins — constant-width model input at any vocabulary "
        "size. Per bucket: row count, distinct-feature collision "
        "audit, and the signed sum whose collisions cancel in "
        "expectation."
    ),
    tables=("customer",),
)


# --------------------------------------------------------------------------
# Smoothed target encoding — the standard high-cardinality categorical
# feature transform (replace a category with its shrunk label rate).
# Label = customer ever placed a fulfilled ('F') order; categories =
# c_mktsegment and c_nationkey, emitted as one long (feature,
# category) table the way a feature store materializes encoders.
# Shrinkage enc = (pos_g + m*p_global)/(n_g + m) with prior m = 100 is
# kept EXACT by clearing denominators:
#   enc = (pos_g*n_all + m*pos_all) / (n_all*(n_g + m))
# — two BIGINT polynomials, one IEEE division at the boundary; the
# lift ratio multiplies on n_all/pos_all in DOUBLE (the all-integer
# form would cube a row-count and overflow int64 at ~1e9 users). Plan:
# one
# customer⨝orders semi-style label agg (map-side combined), two
# category-grouped reduces over the labeled users, a UNION ALL, and a
# broadcast scalar total. Category cardinality bounds every shuffle;
# at 100 TB the wide stage is the per-customer label reduce.
# --------------------------------------------------------------------------

_TARGET_ENC_SQL = """
WITH labeled AS (
  SELECT c.c_custkey, c.c_mktsegment, c.c_nationkey,
         CASE WHEN EXISTS (
           SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
         ) THEN 1 ELSE 0 END AS y
  FROM customer c
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(y) AS BIGINT) AS pos_all
  FROM labeled
),
cats AS (
  SELECT 'mktsegment' AS feature, c_mktsegment AS category,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM labeled GROUP BY c_mktsegment
  UNION ALL
  SELECT 'nation' AS feature, CAST(c_nationkey AS STRING) AS category,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM labeled GROUP BY c_nationkey
)
SELECT c.feature, c.category, c.n, c.pos,
       CAST(c.pos * t.n_all + 100 * t.pos_all AS DOUBLE)
         / (t.n_all * (c.n + 100)) AS target_enc,
       CAST(c.pos * t.n_all + 100 * t.pos_all AS DOUBLE)
         / (t.n_all * (c.n + 100))
         * CAST(t.n_all AS DOUBLE) / CAST(t.pos_all AS DOUBLE)
           AS lift_vs_global
FROM cats c CROSS JOIN tot t
ORDER BY c.feature, c.category
"""


sql_query(
    "ml_target_encoding",
    _TARGET_ENC_SQL,
    oracle=_TARGET_ENC_SQL.replace("AS STRING", "AS VARCHAR"),
    category="ml",
    doc=(
        "Smoothed target encoding of c_mktsegment and c_nationkey "
        "against the fulfilled-order label: shrunk rate (pos_g + "
        "m*p_global)/(n_g + m) with m=100, computed as exact BIGINT "
        "polynomials with one boundary IEEE division, plus the lift "
        "ratio vs the global rate. Per-customer label reduce, two "
        "bounded category aggs, broadcast scalar totals."
    ),
    tables=("customer", "orders"),
)


# --------------------------------------------------------------------------
# Calibration-bin / ECE evaluation (round 9). Extends the eval family
# (nDCG@10, bootstrap CI) with the classifier-calibration audit:
# scores come from the corpus's salted-md5-coin convention (a
# synthetic "model" — uniform scores against a real label make the
# reliability diagram non-trivial by construction: per-bin confidence
# ramps 0.05→0.95 while accuracy stays at the label base rate), bins
# are exact integer deciles of the 16-bit coin (coin*10 // 65536 — no
# float ever enters the binning), and per-bin counts stay BIGINT. The
# only IEEE ops are the two boundary divisions (confidence, accuracy);
# the |acc − conf| gap is micro-quantized so the weighted ECE numerator
# stays an exact integer: ECE = SUM(ece_contrib_micro) / (1e6·SUM(n)).
# Scale shape: one map-side-combined 10-group agg; constant output.
# --------------------------------------------------------------------------


def _ece_sql(coin: str, intdiv) -> str:
    return f"""
WITH scored AS (
  SELECT {coin} AS coin,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS label
  FROM orders
),
g AS (
  SELECT {intdiv("coin * 10", "65536")} AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(label) AS BIGINT) AS n_pos,
         CAST(SUM(coin) AS BIGINT) AS sum_score
  FROM scored GROUP BY {intdiv("coin * 10", "65536")}
),
m AS (
  SELECT bin, n, n_pos, sum_score,
         CAST(sum_score AS DOUBLE) / (n * 65536) AS confidence,
         CAST(n_pos AS DOUBLE) / n AS accuracy
  FROM g
)
SELECT bin, n, n_pos, sum_score, confidence, accuracy,
       CAST(FLOOR(ABS(accuracy - confidence) * CAST(1000000 AS DOUBLE))
            AS BIGINT) AS gap_micro,
       CAST(FLOOR(ABS(accuracy - confidence) * CAST(1000000 AS DOUBLE))
            AS BIGINT) * n AS ece_contrib_micro
FROM m
"""


_SPARK_CAL_COIN = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT('cal#', CAST(o_orderkey AS STRING))),"
    " 1, 4), 16, 10) AS BIGINT)"
)
_DUCK_CAL_COIN = _duck_coin("'cal#' || CAST(o_orderkey AS VARCHAR)")


sql_query(
    "ml_calibration_ece",
    _ece_sql(_SPARK_CAL_COIN, lambda a, b: f"({a}) DIV ({b})"),
    oracle=_ece_sql(_DUCK_CAL_COIN, lambda a, b: f"({a}) // ({b})"),
    category="ml",
    doc=(
        "Expected-calibration-error bins: md5-coin scores vs the "
        "urgent-priority label, 10 exact integer decile bins, per-bin "
        "confidence/accuracy (one IEEE division each over exact BIGINT "
        "sums) and the micro-quantized |acc-conf| gap; "
        "ECE = SUM(ece_contrib_micro) / (1e6 * SUM(n))."
    ),
    tables=("orders",),
)


# --------------------------------------------------------------------------
# Inter-annotator agreement — Cohen's kappa (round 9). The label-audit
# every human/LLM annotation pipeline runs before trusting a training
# signal: two synthetic annotators share a deterministic base rule
# (n_chars >= 300) and each flips it independently with its own
# salted-md5 coin (A: 10 %, B: 20 %), so the confusion matrix, the
# observed agreement, the chance agreement, and kappa are all fixed
# functions of the corpus — non-degenerate by construction (kappa lands
# well inside (0, 1)). Per-language confusion counts stay exact
# BIGINTs; po/pe/kappa are short IEEE chains over those exact ints
# (divisions, products, one final ratio — no transcendentals), bit-
# identical across engines. Scale: one map-side-combined 5-group agg.
# --------------------------------------------------------------------------


def _kappa_sql(coin_a: str, coin_b: str) -> str:
    return f"""
WITH lab AS (
  SELECT lang,
         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS base,
         CASE WHEN {coin_a} < 6554 THEN 1 ELSE 0 END AS flip_a,
         CASE WHEN {coin_b} < 13107 THEN 1 ELSE 0 END AS flip_b
  FROM documents
),
ann AS (
  SELECT lang,
         ABS(base - flip_a) AS a,
         ABS(base - flip_b) AS b
  FROM lab
),
cm AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
         CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
  FROM ann GROUP BY lang
),
m AS (
  SELECT lang, n, n00, n01, n10, n11,
         CAST(n00 + n11 AS DOUBLE) / n AS po,
         (CAST(n10 + n11 AS DOUBLE) / n) * (CAST(n01 + n11 AS DOUBLE) / n)
         + (CAST(n00 + n01 AS DOUBLE) / n) * (CAST(n00 + n10 AS DOUBLE) / n)
           AS pe
  FROM cm
)
SELECT lang, n, n00, n01, n10, n11, po, pe,
       CASE WHEN pe = CAST(1 AS DOUBLE) THEN CAST(0 AS DOUBLE)
            ELSE (po - pe) / (CAST(1 AS DOUBLE) - pe) END AS kappa
FROM m
"""


_SPARK_ANN_A = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT('annA#', CAST(doc_id AS STRING))),"
    " 1, 4), 16, 10) AS BIGINT)"
)
_SPARK_ANN_B = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT('annB#', CAST(doc_id AS STRING))),"
    " 1, 4), 16, 10) AS BIGINT)"
)
_DUCK_ANN_A = _duck_coin("'annA#' || CAST(doc_id AS VARCHAR)")
_DUCK_ANN_B = _duck_coin("'annB#' || CAST(doc_id AS VARCHAR)")


sql_query(
    "ml_annotator_kappa",
    _kappa_sql(_SPARK_ANN_A, _SPARK_ANN_B),
    oracle=_kappa_sql(_DUCK_ANN_A, _DUCK_ANN_B),
    category="ml",
    doc=(
        "Inter-annotator agreement: Cohen's kappa per language between "
        "two deterministic synthetic annotators (shared n_chars rule, "
        "independent 10 %/20 % md5-coin flips). Exact BIGINT confusion "
        "matrix; po/pe/kappa as short IEEE chains; the pe=1 degenerate "
        "guard is pinned cross-engine."
    ),
    tables=("documents",),
)


# --------------------------------------------------------------------------
# Exact ROC AUC (round 10, queued for the r11 window): the standard
# ranking-quality readout of a scoring model, computed through the
# rank-sum identity AUC = U / (n_pos * n_neg) where U counts
# (positive, negative) pairs the score orders correctly plus half the
# cross-ties — the SAME distributed two-stage prefix sum that powers
# stat_mann_whitney (per-distinct-score class counts, bucket totals, a
# bounded bucket-offset window, never a whole-table rank window and
# never the n_pos x n_neg pair materialization). 2U stays an exact
# BIGINT; AUC and Gini are single fixed-shape IEEE divisions of exact
# integers, so the hash matches DuckDB bit-for-bit. Overflow contract:
# 2U <= 2 * n_pos * n_neg must fit BIGINT — beyond ~2e9 rows per side,
# shard the score range first (the KS n1*n2 < 2^63 convention).
# In-corpus scenario: does the event `value` rank purchase events
# above non-purchase ones.
# --------------------------------------------------------------------------


# one scan: per-distinct-score class counts (shared by AUC and the
# lift/gains table; each stages its own checkpointed copy)
_SCORE_CLASS_G = """
SELECT v, CAST(FLOOR(v / 50.0) AS BIGINT) AS bucket,
       CAST(SUM(pos) AS BIGINT) AS c1,
       CAST(SUM(1 - pos) AS BIGINT) AS c2
FROM (
  SELECT value AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events WHERE value IS NOT NULL
) v GROUP BY v
"""


def _auc_tail(g: str, declared) -> str:
    return f"""
WITH n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n_pos,
         CAST(SUM(c2) AS BIGINT) AS n_neg
  FROM {g}
),
bt AS (
  SELECT bucket, CAST(SUM(c2) AS BIGINT) AS bc2 FROM {g} GROUP BY bucket
),
off AS (
  SELECT bucket,
         CAST(COALESCE(SUM(bc2) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o2
  FROM {declared("bt")}
),
c AS (
  SELECT g.c1, g.c2,
         o.o2 + SUM(g.c2) OVER (PARTITION BY g.bucket ORDER BY g.v
              ROWS UNBOUNDED PRECEDING) - g.c2 AS f2_below
  FROM {g} g JOIN off o ON o.bucket = g.bucket
),
u AS (
  SELECT CAST(SUM(2 * c.c1 * c.f2_below + c.c1 * c.c2) AS BIGINT) AS u2
  FROM c
)
SELECT n.n_pos, n.n_neg, u.u2,
       -- one-class degenerate decided in exact integer space: AUC is
       -- undefined, pinned to the chance value 0.5 on both engines
       CASE WHEN n.n_pos = 0 OR n.n_neg = 0 THEN CAST(0.5 AS DOUBLE)
            ELSE CAST(u.u2 AS DOUBLE)
                 / (CAST(2 AS DOUBLE) * CAST(n.n_pos AS DOUBLE)
                    * CAST(n.n_neg AS DOUBLE))
       END AS auc,
       CASE WHEN n.n_pos = 0 OR n.n_neg = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(2 AS DOUBLE)
                 * (CAST(u.u2 AS DOUBLE)
                    / (CAST(2 AS DOUBLE) * CAST(n.n_pos AS DOUBLE)
                       * CAST(n.n_neg AS DOUBLE)))
                 - CAST(1 AS DOUBLE)
       END AS gini
FROM u CROSS JOIN n
"""


def _register_auc() -> None:
    from aws_etl_spark.queries.sql_seams import duck_declared

    duck_tail = _auc_tail("g", duck_declared)
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "ml_auc_roc",
        ops=(("view", "auc_g", _SCORE_CLASS_G),),
        final=_auc_tail("auc_g", spark_declared),
        oracle=(
            f"WITH g AS ({_SCORE_CLASS_G}),\n" + duck_tail[len("\nWITH ") :]
        ),
        category="ml",
        doc=(
            "Exact ROC AUC + Gini of the event value score separating "
            "purchase from non-purchase events, via the rank-sum "
            "identity AUC = U/(n_pos*n_neg): 2U stays an exact BIGINT "
            "through the Mann-Whitney two-stage prefix sum (no rank "
            "materialization, no pos x neg pair join); AUC/Gini are "
            "fixed-shape IEEE divisions with the one-class degenerate "
            "pinned to 0.5/0 in integer space. One staged events scan."
        ),
        tables=("events",),
    )


_register_auc()


# --------------------------------------------------------------------------
# Cumulative gains / lift at score deciles (round 10, queued for the
# r11 window): the targeting readout next to ml_auc_roc — AUC says
# whether the score ranks positives up, the gains table says what a
# campaign gets by acting on the top k/10 of it. Decile assignment is
# EXACT and tie-stable without any global row sort: per distinct
# score, the two-stage prefix sum gives f_below (rows strictly
# below), so rows-above = N − f_below − c and decile = (10 ·
# rows_above) DIV N — every row of a tied score lands in the decile
# of the tie's best rank, identically on both engines. Per-decile
# and cumulative counts stay BIGINTs (the cum window runs on the ≤10
# row decile spine through the declared seam); gain = cum_pos/P and
# lift = cum_pos·N/(cum_n·P) are single IEEE divisions of exact
# integers. Zero-positive corpora pin gain/lift to 0 in integer
# space.
# --------------------------------------------------------------------------


def _lift_sql(declared, intdiv) -> str:
    dec = intdiv("10 * (n.total - g.f_below - g.c)", "n.total")
    return f"""
WITH n AS (
  SELECT CAST(SUM(c1 + c2) AS BIGINT) AS total,
         CAST(SUM(c1) AS BIGINT) AS p
  FROM {{G}}
),
g0 AS (
  SELECT v, bucket, CAST(c1 + c2 AS BIGINT) AS c, c1 AS cp
  FROM {{G}}
),
bt AS (
  SELECT bucket, CAST(SUM(c) AS BIGINT) AS bc FROM g0 GROUP BY bucket
),
off AS (
  SELECT bucket,
         CAST(COALESCE(SUM(bc) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o
  FROM {declared("bt")}
),
g AS (
  SELECT g0.v, g0.c, g0.cp,
         o.o + SUM(g0.c) OVER (PARTITION BY g0.bucket ORDER BY g0.v
              ROWS UNBOUNDED PRECEDING) - g0.c AS f_below
  FROM g0 JOIN off o ON o.bucket = g0.bucket
),
d AS (
  SELECT CAST({dec} AS BIGINT) AS decile,
         CAST(SUM(g.c) AS BIGINT) AS n_rows,
         CAST(SUM(g.cp) AS BIGINT) AS n_pos
  FROM g CROSS JOIN n
  GROUP BY CAST({dec} AS BIGINT)
),
cum AS (
  SELECT decile, n_rows, n_pos,
         CAST(SUM(n_rows) OVER (PARTITION BY __g ORDER BY decile
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
         CAST(SUM(n_pos) OVER (PARTITION BY __g ORDER BY decile
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
  FROM {declared("d")}
)
SELECT c.decile, c.n_rows, c.n_pos, c.cum_n, c.cum_pos,
       CASE WHEN n.p = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(c.cum_pos AS DOUBLE) / CAST(n.p AS DOUBLE)
       END AS gain,
       CASE WHEN n.p = 0 OR c.cum_n = 0 THEN CAST(0 AS DOUBLE)
            ELSE (CAST(c.cum_pos AS DOUBLE) * CAST(n.total AS DOUBLE))
                 / (CAST(c.cum_n AS DOUBLE) * CAST(n.p AS DOUBLE))
       END AS lift
FROM cum c CROSS JOIN n
ORDER BY c.decile
"""


def _register_lift() -> None:
    from aws_etl_spark.queries.sql_seams import duck_declared

    duck_tail = _lift_sql(
        duck_declared, lambda a, b: f"({a}) // ({b})"
    ).replace("{G}", "sg")
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "ml_lift_gains",
        ops=(("view", "lift_g", _SCORE_CLASS_G),),
        final=_lift_sql(
            spark_declared, lambda a, b: f"({a}) DIV ({b})"
        ).replace("{G}", "lift_g"),
        oracle=(
            f"WITH sg AS ({_SCORE_CLASS_G}),\n" + duck_tail[len("\nWITH ") :]
        ),
        category="ml",
        doc=(
            "Cumulative gains and lift at score deciles (value score, "
            "purchase positives): tie-stable exact decile assignment "
            "from the two-stage prefix sum — decile = 10*(rows above) "
            "DIV N, no global row sort — BIGINT per-decile and "
            "cumulative counts over the bounded decile spine, gain "
            "and lift as single IEEE divisions; zero-positive corpus "
            "pinned to 0 in integer space. One staged events scan "
            "(the same per-distinct-score class table ml_auc_roc "
            "stages)."
        ),
        tables=("events",),
    )


_register_lift()


# --------------------------------------------------------------------------
# Exact average precision / PR-AUC (round 11, queued for the r12
# window): the class-imbalance-honest companion to ml_auc_roc — ROC
# AUC stays optimistic when negatives dominate (a fraud model at
# 1:10000 can post AUC 0.99 and still be useless at any actionable
# threshold); average precision weights each threshold by the
# positives it recovers, which is what a triage queue experiences.
# AP = Σ_t (ΔRecall_t · Precision_t) over distinct score thresholds
# descending = (1/P) · Σ_t c1_t · TP_t / PP_t, where per distinct
# score t: c1_t positives sit exactly at t, TP_t = P − pos_below(t),
# PP_t = N − all_below(t). Both prefix counts come from the SAME
# two-stage prefix sum that powers ml_auc_roc (per-distinct-score
# class counts → bucket totals → bounded bucket-offset window —
# never a global rank window, never a pair join). Each term is one
# fixed-shape IEEE chain nano-quantized (FLOOR ×1e9) before the
# order-free BIGINT sum, the lnratio idiom; quantization error is
# < n_distinct/1e9 absolute and identical on both engines. Overflow
# contract: Σ terms ≤ P, so ap_q = P·1e9 must fit BIGINT ⇒ P ≤ 9e9
# positives. One-class degenerates pin in integer space: P = 0 → AP
# 0; the all-positive corpus correctly reads AP = 1 (every PP = TP).
# QUANTIZATION BUDGET (runtime tripwire, r11 verdict item 3): the
# nano-quantization error on avg_precision itself is
# < n_thresholds / (1e9 · P) — negligible on the corpus's coarse score
# grid, but on a CONTINUOUS score with rare positives (n_thresholds
# ≫ P) it degrades. The stated budget is |error| ≤ 1e-6, i.e.
# n_thresholds ≤ 1000 · P; the query emits quant_budget_exceeded = 1
# when the data leaves that regime (decided on exact BIGINTs, hash-
# identical on both engines) so a corpus change surfaces in the
# output, not only to a reader of ADVICE.md.
# --------------------------------------------------------------------------


def _pr_auc_tail(g: str, declared) -> str:
    term = (
        "CAST(c.c1 AS DOUBLE)"
        " * (CAST(n.p - c.f1_below AS DOUBLE)"
        "    / CAST(n.total - c.f_below AS DOUBLE))"
        " * CAST(1000000000 AS DOUBLE)"
    )
    return f"""
WITH n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS p,
         CAST(SUM(c1 + c2) AS BIGINT) AS total
  FROM {g}
),
bt AS (
  SELECT bucket,
         CAST(SUM(c1) AS BIGINT) AS bc1,
         CAST(SUM(c1 + c2) AS BIGINT) AS bc
  FROM {g} GROUP BY bucket
),
off AS (
  SELECT bucket,
         CAST(COALESCE(SUM(bc1) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o1,
         CAST(COALESCE(SUM(bc) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o
  FROM {declared("bt")}
),
c AS (
  SELECT g.c1,
         o.o1 + SUM(g.c1) OVER (PARTITION BY g.bucket ORDER BY g.v
              ROWS UNBOUNDED PRECEDING) - g.c1 AS f1_below,
         o.o + SUM(g.c1 + g.c2) OVER (PARTITION BY g.bucket ORDER BY g.v
              ROWS UNBOUNDED PRECEDING) - (g.c1 + g.c2) AS f_below
  FROM {g} g JOIN off o ON o.bucket = g.bucket
),
t AS (
  SELECT CAST(SUM(CAST(FLOOR({term}) AS BIGINT)) AS BIGINT) AS ap_q,
         CAST(COUNT(*) AS BIGINT) AS n_thresholds
  FROM c CROSS JOIN n
)
SELECT n.p AS n_pos, n.total - n.p AS n_neg, t.n_thresholds,
       CASE WHEN n.p = 0 THEN CAST(0 AS DOUBLE)
            ELSE (CAST(t.ap_q AS DOUBLE) / CAST(1000000000 AS DOUBLE))
                 / CAST(n.p AS DOUBLE)
       END AS avg_precision,
       CAST(CASE WHEN n.p > 0 AND t.n_thresholds > 1000 * n.p
                 THEN 1 ELSE 0 END AS BIGINT) AS quant_budget_exceeded
FROM t CROSS JOIN n
"""


def _register_pr_auc() -> None:
    from aws_etl_spark.queries.sql_seams import duck_declared

    duck_tail = _pr_auc_tail("g", duck_declared)
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "ml_pr_auc",
        ops=(("view", "prauc_g", _SCORE_CLASS_G),),
        final=_pr_auc_tail("prauc_g", spark_declared),
        oracle=(
            f"WITH g AS ({_SCORE_CLASS_G}),\n" + duck_tail[len("\nWITH ") :]
        ),
        category="ml",
        doc=(
            "Exact average precision (step-interpolated PR-AUC) of the "
            "event value score separating purchase from non-purchase "
            "events: AP = (1/P) sum over distinct thresholds of "
            "c1*TP/PP, with TP/PP from the Mann-Whitney two-stage "
            "prefix sum (no rank materialization, no pair join), each "
            "term nano-quantized before the order-free BIGINT sum. "
            "One staged events scan (the same per-distinct-score "
            "class table ml_auc_roc stages); P=0 pinned to 0 in "
            "integer space. quant_budget_exceeded flags "
            "n_thresholds > 1000*P, where the nano-quantization "
            "error bound on AP leaves the stated 1e-6 budget."
        ),
        tables=("events",),
    )


_register_pr_auc()


# --------------------------------------------------------------------------
# Binary confusion matrix + Matthews correlation (round 11 late batch,
# queued for the r12 window): the thresholded-classifier readout the
# score-curve evals (ROC AUC, PR-AUC, lift) deliberately avoid — once
# a model SHIPS a cutoff, the monitor reads TP/FP/FN/TN and the four
# derived rates. The synthetic predictor follows the annotator-kappa
# construction (a degenerate independent score would pin MCC ~ 0):
# prediction = label flipped with a 15 % salted-md5 coin, so the
# confusion matrix is a fixed, non-trivial function of the corpus.
# All four cells are exact BIGINTs from one scan; precision / recall /
# F1 = 2TP/(2TP+FP+FN) / MCC are each one fixed IEEE chain over the
# exact cells (the MCC numerator TP*TN-FP*FN in DECIMAL(38,0) — never
# BIGINT, which overflows at n ~ 3e9 — and the denominator as four
# independent SQRTs multiplied, one canonical order). Any zero margin
# pins MCC to 0 in integer space (the mathematical limit).
# Scale: one map-side-combined aggregation, constant output.
# --------------------------------------------------------------------------


def _mcc_sql(coin: str) -> str:
    return f"""
WITH lab AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y,
         CASE WHEN {coin} < 9830 THEN 1 ELSE 0 END AS flip
  FROM orders
),
p AS (SELECT y, ABS(y - flip) AS yhat FROM lab),
cm AS (
  SELECT
    CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN y = 1 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN y = 0 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM p
)
SELECT tp, fp, fn, tn,
       CASE WHEN tp + fp = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
       END AS precision_,
       CASE WHEN tp + fn = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
       END AS recall_,
       CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
       END AS f1,
       CASE WHEN tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0 OR tn + fn = 0
            THEN CAST(0 AS DOUBLE)
            ELSE CAST(CAST(tp AS DECIMAL(38,0)) * CAST(tn AS DECIMAL(38,0))
                      - CAST(fp AS DECIMAL(38,0)) * CAST(fn AS DECIMAL(38,0))
                      AS DOUBLE)
                 / (SQRT(CAST(tp + fp AS DOUBLE)) * SQRT(CAST(tp + fn AS DOUBLE))
                    * SQRT(CAST(tn + fp AS DOUBLE)) * SQRT(CAST(tn + fn AS DOUBLE)))
       END AS mcc
FROM cm
"""


_SPARK_MCC_COIN = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT('mcc#', CAST(o_orderkey AS STRING))),"
    " 1, 4), 16, 10) AS BIGINT)"
)
_DUCK_MCC_COIN = _duck_coin("'mcc#' || CAST(o_orderkey AS VARCHAR)")


sql_query(
    "ml_mcc_confusion",
    _mcc_sql(_SPARK_MCC_COIN),
    oracle=_mcc_sql(_DUCK_MCC_COIN),
    category="ml",
    doc=(
        "Binary confusion matrix of the 15%-flipped urgent-priority "
        "predictor: exact BIGINT TP/FP/FN/TN in one scan, precision / "
        "recall / F1 = 2TP/(2TP+FP+FN) / Matthews correlation each as "
        "one fixed IEEE chain (MCC numerator in DECIMAL(38,0), "
        "denominator as four independent SQRTs), zero margins pinning "
        "MCC to 0 in integer space."
    ),
    tables=("orders",),
)


# --------------------------------------------------------------------------
# Brier score + Murphy decomposition (round 11 late batch, queued for
# the r12 window): ECE reads the calibration GAP per bin; the Brier
# score is the proper scoring rule that also prices SHARPNESS, and its
# Murphy decomposition (reliability - resolution + uncertainty over
# the binned forecasts) attributes the loss. Same md5-coin forecast
# and exact integer decile bins as ml_calibration_ece. The score
# itself is EXACT: (coin - 65536*y) is an integer on the 1/65536 grid,
# so the Brier numerator sum((coin-65536y)^2) is an exact
# DECIMAL(38,0) (BIGINT clears at ~2e9 rows) collected as a staged
# scalar in its own single-column pass; the bin rollup is one more
# staged scan, and the three decomposition terms run over the 10-row
# bin table: per-bin chains nano-quantized (FLOOR x1e9) before the
# order-free BIGINT sums. Degenerates: an empty table yields the
# typed-NULL staged scalar and a 0-row output on both engines.
# Contract: sum((coin-65536y)^2) <= n*65535^2 < 1e38 at any real n.
# --------------------------------------------------------------------------


def _brier_scored(coin: str) -> str:
    return f"""
SELECT {coin} AS coin,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END AS y
FROM orders
"""


def _brier_bins(coin: str, intdiv) -> str:
    return f"""
SELECT {intdiv("coin * 10", "65536")} AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_k,
       CAST(SUM(y) AS BIGINT) AS pos_k,
       CAST(SUM(coin) AS BIGINT) AS sc_k
FROM ({_brier_scored(coin)}) s GROUP BY {intdiv("coin * 10", "65536")}
"""


def _brier_bq(coin: str) -> str:
    # the whole Brier score as ONE fixed IEEE chain over the exact
    # DECIMAL numerator (sum of integers on the 1/65536 grid) — a
    # double, so it rides the registry's repr-round-trip scalar
    # substitution exactly; the oracle runs the identical text.
    return f"""
SELECT CAST(SUM(CAST(coin - 65536 * y AS DECIMAL(19,0))
                * CAST(coin - 65536 * y AS DECIMAL(19,0)))
            AS DOUBLE)
       / (CAST(COUNT(*) AS DOUBLE) * CAST(65536 AS DOUBLE)
          * CAST(65536 AS DOUBLE)) AS bq
FROM ({_brier_scored(coin)}) s
"""


def _brier_tail(bins: str, bq: str) -> str:
    pbar = "(CAST(b.sc_k AS DOUBLE) / (CAST(b.n_k AS DOUBLE) * CAST(65536 AS DOUBLE)))"
    ybar_k = "(CAST(b.pos_k AS DOUBLE) / CAST(b.n_k AS DOUBLE))"
    ybar = "(CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE))"
    rel = f"CAST(b.n_k AS DOUBLE) * ({pbar} - {ybar_k}) * ({pbar} - {ybar_k})"
    res = f"CAST(b.n_k AS DOUBLE) * ({ybar_k} - {ybar}) * ({ybar_k} - {ybar})"
    return f"""
WITH t AS (
  SELECT CAST(COALESCE(SUM(n_k), 0) AS BIGINT) AS n,
         CAST(COALESCE(SUM(pos_k), 0) AS BIGINT) AS pos
  FROM {bins}
),
q AS (
  SELECT CAST(SUM(CAST(FLOOR(({rel}) * 1000000000) AS BIGINT)) AS BIGINT)
           AS rel_q,
         CAST(SUM(CAST(FLOOR(({res}) * 1000000000) AS BIGINT)) AS BIGINT)
           AS res_q
  FROM {bins} b CROSS JOIN t
)
SELECT t.n AS n_orders, t.pos AS n_pos,
       {bq} AS brier,
       (CAST(q.rel_q AS DOUBLE) / CAST(1000000000 AS DOUBLE))
         / CAST(t.n AS DOUBLE) AS reliability,
       (CAST(q.res_q AS DOUBLE) / CAST(1000000000 AS DOUBLE))
         / CAST(t.n AS DOUBLE) AS resolution,
       {"(CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE)) * (CAST(1 AS DOUBLE) - CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE))"}
         AS uncertainty
FROM t CROSS JOIN q
WHERE t.n > 0
"""


def _register_brier() -> None:
    duck_tail = _brier_tail("bins", "bq.bq")
    assert duck_tail.startswith("\nWITH ")
    spark_bins = _brier_bins(_SPARK_CAL_COIN, lambda a, b: f"({a}) DIV ({b})")
    duck_bins = _brier_bins(_DUCK_CAL_COIN, lambda a, b: f"({a}) // ({b})")
    staged_sql_query(
        "ml_brier_decomposition",
        ops=(
            ("view", "brier_bins", spark_bins),
            ("scalar", "BRIER_BQ", _brier_bq(_SPARK_CAL_COIN)),
        ),
        final=_brier_tail("brier_bins", "{BRIER_BQ}"),
        oracle=(
            f"WITH bins AS ({duck_bins}),\n"
            f"bq AS ({_brier_bq(_DUCK_CAL_COIN)}),\n"
            + duck_tail[len("\nWITH ") :].replace(
                "FROM t CROSS JOIN q", "FROM t CROSS JOIN q CROSS JOIN bq"
            )
        ),
        category="ml",
        doc=(
            "Brier score with the Murphy decomposition over the "
            "md5-coin forecast vs the urgent-priority label: the score "
            "numerator is the exact integer sum((coin-65536y)^2) on "
            "the 1/65536 grid (staged scalar), reliability and "
            "resolution run over the 10-row staged decile-bin table "
            "with per-bin chains nano-quantized before order-free "
            "sums, uncertainty = ybar(1-ybar) as one IEEE chain."
        ),
        tables=("orders",),
    )


_register_brier()


# --------------------------------------------------------------------------
# Log loss / cross-entropy + skill score (round 12, queued for the r13
# window): the Brier/Murphy readout above prices squared error; log
# loss is the likelihood-based proper scoring rule training actually
# optimizes, and the one that punishes CONFIDENT wrong forecasts
# hardest — a calibration dashboard reports both. Same md5-coin
# forecast and urgent-priority label as ml_calibration_ece / the
# Brier pair, with the forecast placed strictly inside (0,1) on the
# mid-grid p = (2*coin+1)/131072 (coin 0..65535) so ln never sees 0 —
# an explicit clamp contract, not an epsilon hack. Per-row term
# y*ln(p) + (1-y)*ln(1-p) is one fixed IEEE chain micro-quantized
# (FLOOR x1e6 — FLOOR floors on both engines, negatives included)
# before the order-free BIGINT sum. The baseline is the
# constant-prevalence forecast: -(P*ln(P/n) + (n-P)*ln(1-P/n))/n as
# one fixed IEEE chain over exact integers (one-class corpora pin the
# missing term to 0 in integer space), and skill = 1 - LL/LL_base.
# Scale: one map-side-combined scan, constant output. Overflow: each
# quantized term is >= ln(1/131072)*1e6 ~ -1.2e7, so the sum clears
# BIGINT to n ~ 7e11 rows.
# --------------------------------------------------------------------------


def _log_loss_sql(coin: str) -> str:
    p = "((CAST(2 AS DOUBLE) * CAST(coin AS DOUBLE) + CAST(1 AS DOUBLE)) / CAST(131072 AS DOUBLE))"
    term = (
        f"CASE WHEN y = 1 THEN LN({p}) "
        f"ELSE LN(CAST(1 AS DOUBLE) - {p}) END"
    )
    return f"""
WITH s AS (
  SELECT {coin} AS coin,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders
),
q AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(y), 0) AS BIGINT) AS pos,
         CAST(COALESCE(SUM(CAST(FLOOR(({term}) * 1000000) AS BIGINT)), 0)
              AS BIGINT) AS ll_q
  FROM s
),
f AS (
  SELECT n, pos,
         CASE WHEN n = 0 THEN CAST(0 AS DOUBLE)
              ELSE -(CAST(ll_q AS DOUBLE) / CAST(1000000 AS DOUBLE))
                   / CAST(n AS DOUBLE)
         END AS log_loss,
         CASE WHEN n = 0 THEN CAST(0 AS DOUBLE)
              ELSE -(
                (CASE WHEN pos = 0 THEN CAST(0 AS DOUBLE)
                      ELSE CAST(pos AS DOUBLE)
                           * LN(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                 END)
                + (CASE WHEN pos = n THEN CAST(0 AS DOUBLE)
                        ELSE CAST(n - pos AS DOUBLE)
                             * LN(CAST(n - pos AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                   END)
              ) / CAST(n AS DOUBLE)
         END AS baseline_ll
  FROM q
)
SELECT n AS n_orders, pos AS n_pos, log_loss, baseline_ll,
       CASE WHEN baseline_ll = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(1 AS DOUBLE) - log_loss / baseline_ll
       END AS skill_score
FROM f
"""


sql_query(
    "ml_log_loss",
    _log_loss_sql(_SPARK_CAL_COIN),
    oracle=_log_loss_sql(_DUCK_CAL_COIN),
    category="ml",
    doc=(
        "Log loss (cross-entropy) of the md5-coin forecast vs the "
        "urgent-priority label on the strict-interior mid-grid "
        "p = (2*coin+1)/131072: per-row ln terms micro-quantized "
        "before the order-free BIGINT sum, the constant-prevalence "
        "baseline as one fixed IEEE chain over exact integers "
        "(one-class terms pinned in integer space), and the skill "
        "score 1 - LL/LL_base. One map-side-combined orders scan."
    ),
    tables=("orders",),
)


# --------------------------------------------------------------------------
# Fleiss' kappa — multi-rater agreement (round 12, queued for the r13
# window): ml_annotator_kappa reads agreement between TWO annotators;
# real labeling fleets run 3+ raters per item, and Fleiss' kappa is
# the standard chance-corrected readout there. Three synthetic raters
# follow the annotator-kappa construction (independent salted-md5
# coins, each the label flipped w.p. 15% — an independent-rater
# degenerate would pin kappa ~ 0). Fully exact rational arithmetic:
# per item, n1 = raters voting 1, and the agreement numerator
# A = sum_i [n1*(n1-1) + (3-n1)*(2-n1)] is an exact BIGINT; with
# T1 = sum n1, T0 = 3N - T1, B = T1^2 + T0^2, the identity
# kappa = (Pbar - Pe)/(1 - Pe) = (3N*A - 2B) / (18N^2 - 2B) makes
# kappa ONE IEEE division of exact DECIMAL(38,0) integers — no
# quantization anywhere. The all-one-category degenerate (Pe = 1,
# denominator 0) pins kappa to 0 in integer space. Scale: one orders
# scan, three md5 chains per row, map-side combine; B ~ 9N^2 clears
# DECIMAL(38,0) to N ~ 1e18.
# --------------------------------------------------------------------------


def _fleiss_sql(coin1: str, coin2: str, coin3: str) -> str:
    vote = "CASE WHEN {c} < 9830 THEN 1 - y ELSE y END"
    return f"""
WITH lab AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y,
         {coin1} AS c1, {coin2} AS c2, {coin3} AS c3
  FROM orders
),
votes AS (
  SELECT ({vote.format(c="c1")}) + ({vote.format(c="c2")})
         + ({vote.format(c="c3")}) AS n1
  FROM lab
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(n1 * (n1 - 1)
                           + (3 - n1) * (2 - n1)), 0) AS BIGINT) AS a,
         CAST(COALESCE(SUM(n1), 0) AS BIGINT) AS t1
  FROM votes
),
k AS (
  SELECT n, a, t1, 3 * n - t1 AS t0,
         CAST(t1 AS DECIMAL(19,0)) * CAST(t1 AS DECIMAL(19,0))
           + CAST(3 * n - t1 AS DECIMAL(19,0))
             * CAST(3 * n - t1 AS DECIMAL(19,0)) AS b
  FROM agg
)
SELECT n AS n_items, CAST(3 AS BIGINT) AS m_raters,
       CASE WHEN n = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(a AS DOUBLE) / (CAST(6 AS DOUBLE) * CAST(n AS DOUBLE))
       END AS p_bar,
       CASE WHEN n = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(b AS DOUBLE)
                 / (CAST(9 AS DOUBLE) * CAST(n AS DOUBLE)
                    * CAST(n AS DOUBLE))
       END AS p_e,
       CASE WHEN n = 0
                 OR CAST(18 AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))
                    * CAST(n AS DECIMAL(19,0)) - 2 * b = 0
            THEN CAST(0 AS DOUBLE)
            ELSE CAST(CAST(3 AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))
                      * CAST(a AS DECIMAL(19,0)) - 2 * b AS DOUBLE)
                 / CAST(CAST(18 AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))
                        * CAST(n AS DECIMAL(19,0)) - 2 * b AS DOUBLE)
       END AS fleiss_kappa
FROM k
"""


_SPARK_FLEISS_COINS = tuple(
    "CAST(CONV(SUBSTRING(MD5(CONCAT('fl" + str(j) + "#',"
    " CAST(o_orderkey AS STRING))), 1, 4), 16, 10) AS BIGINT)"
    for j in (1, 2, 3)
)
_DUCK_FLEISS_COINS = tuple(
    _duck_coin(f"'fl{j}#' || CAST(o_orderkey AS VARCHAR)") for j in (1, 2, 3)
)

sql_query(
    "ml_fleiss_kappa",
    _fleiss_sql(*_SPARK_FLEISS_COINS),
    oracle=_fleiss_sql(*_DUCK_FLEISS_COINS),
    category="ml",
    doc=(
        "Fleiss' kappa over three synthetic raters (independent "
        "15%-flip salted-md5 coins of the urgent-priority label): "
        "the agreement numerator A and category totals are exact "
        "BIGINTs from one scan, and kappa = (3N*A - 2B)/(18N^2 - 2B) "
        "with B = T1^2 + T0^2 is ONE IEEE division of exact "
        "DECIMAL(38,0) integers — no quantization; the "
        "all-one-category degenerate (Pe = 1) pins kappa to 0 in "
        "integer space."
    ),
    tables=("orders",),
)


# --------------------------------------------------------------------------
# Standardized partial ROC AUC at FPR <= 0.1 (round 12, queued for the
# r13 window): full ROC AUC averages over operating points a triage
# system will never run at; the partial AUC over the low-FPR region
# is the metric that matches a "we can only action 10% of negatives"
# budget, and McClish standardization maps it back to the familiar
# 0.5-is-random scale. Rides the SAME staged per-distinct-score class
# table as ml_auc_roc / ml_pr_auc (two-stage prefix sums — never a
# global rank, never a pair join). Per distinct score v (descending):
# the ROC segment spans FPR in [F_above/N, (F_above+f_v)/N] and is a
# trapezoid of height (P_above + lam*p_v/2)/P where lam clips the
# segment at the FPR budget (lam = clamp((N/10 - F_above)/f_v, 0, 1));
# each term is one fixed-shape IEEE chain femto-quantized (FLOOR
# x1e15) before the order-free BIGINT sum — sum(area) <= 0.1 so the
# quantized sum <= 1e14, BIGINT-safe, error < n_distinct/1e15 and
# identical on both engines. pauc_std = 0.5*(1 + (pauc - c^2/2)
# / (c - c^2/2)), c = 0.1. One-class degenerates (P = 0 or N = 0)
# pin both outputs to 0 in integer space.
# --------------------------------------------------------------------------


# The ONE FPR-budget constant. Every budget-dependent literal in the
# tail derives from it below (r12 verdict item 4: the three coupled
# literals 10 / 0.005 / 0.095 must satisfy 1/c, c^2/2 and c - c^2/2
# or the emitted metric silently diverges from the documented one).
# Fraction + exact decimal rendering keeps the emitted SQL text
# byte-identical to the certified r12 text for c = 1/10.
_PAUC_FPR_BUDGET = Fraction(1, 10)


def _exact_decimal(f: Fraction) -> str:
    """Render a Fraction as an exact terminating decimal literal
    (asserts the denominator is 2^a * 5^b — a non-terminating budget
    would round differently per engine)."""
    num, den = f.numerator, f.denominator
    scale = 0
    d = den
    for p in (2, 5):
        while d % p == 0:
            d //= p
    assert d == 1, f"non-terminating decimal for {f}"
    while (num * 10**scale) % den:
        scale += 1
    digits = num * 10**scale // den
    if scale == 0:
        return str(digits)
    s = str(digits).rjust(scale + 1, "0")
    return f"{s[:-scale]}.{s[-scale:]}"


def _pauc_tail(g: str, declared) -> str:
    c = _PAUC_FPR_BUDGET
    inv = 1 / c
    assert inv.denominator == 1, "budget row count N/(1/c) needs integer 1/c"
    inv_lit = str(inv.numerator)
    c2half_lit = _exact_decimal(c * c / 2)  # McClish lower bound c^2/2
    span_lit = _exact_decimal(c - c * c / 2)  # McClish span c - c^2/2
    lam = (
        "LEAST(CAST(1 AS DOUBLE), GREATEST(CAST(0 AS DOUBLE),"
        f" (CAST(n.total - n.p AS DOUBLE) / CAST({inv_lit} AS DOUBLE)"
        "  - CAST(c.f_above AS DOUBLE)) / CAST(c.c2 AS DOUBLE)))"
    )
    area = (
        f"(({lam}) * CAST(c.c2 AS DOUBLE)"
        " / CAST(n.total - n.p AS DOUBLE))"
        " * ((CAST(c.p_above AS DOUBLE)"
        f"     + ({lam}) * CAST(c.c1 AS DOUBLE) / CAST(2 AS DOUBLE))"
        "    / CAST(n.p AS DOUBLE))"
    )
    return f"""
WITH n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS p,
         CAST(SUM(c1 + c2) AS BIGINT) AS total
  FROM {g}
),
bt AS (
  SELECT bucket,
         CAST(SUM(c1) AS BIGINT) AS bc1,
         CAST(SUM(c1 + c2) AS BIGINT) AS bc
  FROM {g} GROUP BY bucket
),
off AS (
  SELECT bucket,
         CAST(COALESCE(SUM(bc1) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o1,
         CAST(COALESCE(SUM(bc) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o
  FROM {declared("bt")}
),
c AS (
  SELECT g.c1, g.c2, n.p, n.total,
         -- positives strictly ABOVE this score
         n.p - (o.o1 + SUM(g.c1) OVER (PARTITION BY g.bucket ORDER BY g.v
              ROWS UNBOUNDED PRECEDING)) AS p_above,
         -- negatives strictly ABOVE this score
         (n.total - n.p)
           - ((o.o + SUM(g.c1 + g.c2) OVER (PARTITION BY g.bucket
                ORDER BY g.v ROWS UNBOUNDED PRECEDING))
              - (o.o1 + SUM(g.c1) OVER (PARTITION BY g.bucket ORDER BY g.v
                   ROWS UNBOUNDED PRECEDING))) AS f_above
  FROM {g} g JOIN off o ON o.bucket = g.bucket CROSS JOIN n
),
t AS (
  SELECT CAST(SUM(CASE WHEN c.c2 = 0 THEN CAST(0 AS BIGINT)
                       ELSE CAST(FLOOR(({area})
                                 * CAST(1000000000000000 AS DOUBLE))
                            AS BIGINT)
                  END) AS BIGINT) AS pauc_q,
         CAST(COUNT(*) AS BIGINT) AS n_thresholds
  FROM c CROSS JOIN n
)
SELECT n.p AS n_pos, n.total - n.p AS n_neg, t.n_thresholds,
       CASE WHEN n.p = 0 OR n.total - n.p = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(t.pauc_q AS DOUBLE)
                 / CAST(1000000000000000 AS DOUBLE)
       END AS pauc_fpr10,
       CASE WHEN n.p = 0 OR n.total - n.p = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(0.5 AS DOUBLE)
                 * (CAST(1 AS DOUBLE)
                    + (CAST(t.pauc_q AS DOUBLE)
                       / CAST(1000000000000000 AS DOUBLE)
                       - CAST({c2half_lit} AS DOUBLE))
                      / CAST({span_lit} AS DOUBLE))
       END AS pauc_std
FROM t CROSS JOIN n
"""


def _register_pauc() -> None:
    from aws_etl_spark.queries.sql_seams import duck_declared

    duck_tail = _pauc_tail("g", duck_declared)
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "ml_pauc_fpr10",
        ops=(("view", "pauc_g", _SCORE_CLASS_G),),
        final=_pauc_tail("pauc_g", spark_declared),
        oracle=(
            f"WITH g AS ({_SCORE_CLASS_G}),\n" + duck_tail[len("\nWITH ") :]
        ),
        category="ml",
        doc=(
            "Standardized partial ROC AUC at FPR <= 0.1 (McClish) of "
            "the event value score: trapezoid segments per distinct "
            "score off the same staged class table as ml_auc_roc, the "
            "FPR clip as a per-term clamp, each term femto-quantized "
            "(FLOOR x1e15) before the order-free BIGINT sum, "
            "pauc_std = 0.5*(1 + (pauc - c^2/2)/(c - c^2/2)); "
            "one-class degenerates pinned to 0 in integer space."
        ),
        tables=("events",),
    )


_register_pauc()


# --------------------------------------------------------------------------
# Youden J optimal operating point (round 12 late batch, queued for
# the r13 window): the curve metrics above (AUC, PR-AUC, pAUC) grade
# the score; a deployed classifier still needs ONE threshold, and
# Youden's J = max_t (TPR_t - FPR_t) is the standard
# prevalence-agnostic pick. Rides the same staged per-distinct-score
# class table as ml_auc_roc. Per distinct score v (predict positive
# when score >= v): TP = P - pos_below(v), FP = N - neg_below(v) from
# the two-stage prefix sums; the selection is decided ENTIRELY in
# integer space — J's numerator j_num = TP*N - FP*P is an exact
# BIGINT, the argmax takes the greatest j_num and tie-breaks to the
# LOWEST threshold (deterministic), and only the final readout
# divides. Overflow contract: TP*N <= P*N < 9.2e18 => P*N bounded,
# i.e. ~3e9 x 3e9 balanced classes (document-and-flag class).
# One-class degenerates (P = 0 or N = 0) pin J to 0 with a NULL
# threshold in integer space.
# --------------------------------------------------------------------------


def _youden_tail(g: str, declared) -> str:
    return f"""
WITH n AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS p,
         CAST(SUM(c2) AS BIGINT) AS nn
  FROM {g}
),
bt AS (
  SELECT bucket,
         CAST(SUM(c1) AS BIGINT) AS bc1,
         CAST(SUM(c1 + c2) AS BIGINT) AS bc
  FROM {g} GROUP BY bucket
),
off AS (
  SELECT bucket,
         CAST(COALESCE(SUM(bc1) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o1,
         CAST(COALESCE(SUM(bc) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o
  FROM {declared("bt")}
),
c AS (
  SELECT g.v,
         n.p - (o.o1 + SUM(g.c1) OVER (PARTITION BY g.bucket ORDER BY g.v
              ROWS UNBOUNDED PRECEDING) - g.c1) AS tp,
         n.nn - ((o.o + SUM(g.c1 + g.c2) OVER (PARTITION BY g.bucket
                ORDER BY g.v ROWS UNBOUNDED PRECEDING) - (g.c1 + g.c2))
                 - (o.o1 + SUM(g.c1) OVER (PARTITION BY g.bucket
                      ORDER BY g.v ROWS UNBOUNDED PRECEDING) - g.c1))
           AS fp
  FROM {g} g JOIN off o ON o.bucket = g.bucket CROSS JOIN n
),
j AS (
  SELECT c.v, c.tp, c.fp,
         CAST(c.tp AS BIGINT) * n.nn - CAST(c.fp AS BIGINT) * n.p AS j_num
  FROM c CROSS JOIN n
),
best AS (
  SELECT j.v, j.tp, j.fp, j.j_num
  FROM j
  WHERE j.j_num = (SELECT MAX(j_num) FROM j)
  ORDER BY j.v
  LIMIT 1
)
SELECT n.p AS n_pos, n.nn AS n_neg,
       CASE WHEN n.p = 0 OR n.nn = 0 THEN CAST(NULL AS DOUBLE)
            ELSE b.v END AS best_threshold,
       CASE WHEN n.p = 0 OR n.nn = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(b.tp AS DOUBLE) / CAST(n.p AS DOUBLE)
       END AS tpr_at_best,
       CASE WHEN n.p = 0 OR n.nn = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(b.fp AS DOUBLE) / CAST(n.nn AS DOUBLE)
       END AS fpr_at_best,
       CASE WHEN n.p = 0 OR n.nn = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(b.j_num AS DOUBLE)
                 / (CAST(n.p AS DOUBLE) * CAST(n.nn AS DOUBLE))
       END AS youden_j
FROM n LEFT JOIN best b ON 1 = 1
"""


def _register_youden() -> None:
    from aws_etl_spark.queries.sql_seams import duck_declared

    duck_tail = _youden_tail("g", duck_declared)
    assert duck_tail.startswith("\nWITH ")
    staged_sql_query(
        "ml_youden_threshold",
        ops=(("view", "yj_g", _SCORE_CLASS_G),),
        final=_youden_tail("yj_g", spark_declared),
        oracle=(
            f"WITH g AS ({_SCORE_CLASS_G}),\n" + duck_tail[len("\nWITH ") :]
        ),
        category="ml",
        doc=(
            "Youden J optimal threshold of the event value score: "
            "TP/FP per distinct threshold from the staged class "
            "table's two-stage prefix sums, the argmax decided on the "
            "exact BIGINT numerator TP*N - FP*P with a deterministic "
            "lowest-threshold tiebreak, J/TPR/FPR as final IEEE "
            "divisions; one-class degenerates pin J to 0 with a NULL "
            "threshold."
        ),
        tables=("events",),
    )


_register_youden()


# --------------------------------------------------------------------------
# Quadratic-weighted Cohen's kappa (round 12 late batch, queued for
# the r13 window): ml_annotator_kappa scores NOMINAL agreement — on
# an ORDINAL label (severity, star ratings, priority tiers) it
# punishes a one-level disagreement as hard as a three-level one.
# The quadratic-weighted variant is the standard ordinal fix. Rater 1
# reads the 3-level priority tier (urgent-high=2, medium=1, else 0);
# rater 2 follows the annotator-kappa construction (salted-md5 coin:
# 10% shift up, 10% shift down, clamped to the scale). Fully exact
# rational arithmetic: the observed weighted disagreement
# O = sum (r1-r2)^2 is an exact BIGINT (<= 4N), the expected one
# E = sum_ij (i-j)^2 R_i C_j is a fixed 9-product chain over the
# exact DECIMAL margins, and kappa_w = 1 - N*O/E is ONE IEEE
# division. The zero-expected-disagreement degenerate (all mass in
# one level on either margin... precisely: E = 0) pins kappa to 0 in
# integer space. One scan, map-side combine, constant output.
# --------------------------------------------------------------------------


def _wkappa_sql(coin: str) -> str:
    r1 = (
        "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 2 "
        "WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END"
    )
    return f"""
WITH s AS (
  SELECT r1,
         CASE WHEN c < 6554 THEN LEAST(r1 + 1, 2)
              WHEN c >= 58982 THEN GREATEST(r1 - 1, 0)
              ELSE r1 END AS r2
  FROM (SELECT {r1} AS r1, {coin} AS c FROM orders) q
),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM((r1 - r2) * (r1 - r2)), 0) AS BIGINT) AS o_w,
         CAST(SUM(CASE WHEN r1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r0,
         CAST(SUM(CASE WHEN r1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1m,
         CAST(SUM(CASE WHEN r1 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS r2m,
         CAST(SUM(CASE WHEN r2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN r2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1m,
         CAST(SUM(CASE WHEN r2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2m
  FROM s
),
e AS (
  SELECT n, o_w,
         -- sum_ij (i-j)^2 R_i C_j: the 6 nonzero weights of the
         -- 3x3 grid (w=1: |i-j|=1 pairs; w=4: the 0<->2 corners)
         CAST(CAST(r0 AS DECIMAL(19,0)) * CAST(c1m AS DECIMAL(19,0))
              + CAST(r1m AS DECIMAL(19,0)) * CAST(c0 AS DECIMAL(19,0))
              + CAST(r1m AS DECIMAL(19,0)) * CAST(c2m AS DECIMAL(19,0))
              + CAST(r2m AS DECIMAL(19,0)) * CAST(c1m AS DECIMAL(19,0))
              + 4 * CAST(r0 AS DECIMAL(19,0)) * CAST(c2m AS DECIMAL(19,0))
              + 4 * CAST(r2m AS DECIMAL(19,0)) * CAST(c0 AS DECIMAL(19,0))
              AS DECIMAL(38,0)) AS e_w
  FROM a
)
SELECT n AS n_items,
       CASE WHEN n = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(o_w AS DOUBLE) / CAST(n AS DOUBLE)
       END AS observed_w_disagreement,
       CASE WHEN n = 0 OR e_w = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(e_w AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       END AS expected_w_disagreement,
       CASE WHEN n = 0 OR e_w = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(1 AS DOUBLE)
                 - CAST(CAST(n AS DECIMAL(19,0))
                        * CAST(o_w AS DECIMAL(19,0)) AS DOUBLE)
                   / CAST(e_w AS DOUBLE)
       END AS weighted_kappa
FROM e
"""


_SPARK_WK_COIN = (
    "CAST(CONV(SUBSTRING(MD5(CONCAT('wk#', CAST(o_orderkey AS STRING))),"
    " 1, 4), 16, 10) AS BIGINT)"
)
_DUCK_WK_COIN = _duck_coin("'wk#' || CAST(o_orderkey AS VARCHAR)")

sql_query(
    "ml_weighted_kappa",
    _wkappa_sql(_SPARK_WK_COIN),
    oracle=_wkappa_sql(_DUCK_WK_COIN),
    category="ml",
    doc=(
        "Quadratic-weighted Cohen's kappa on the 3-level ordinal "
        "priority tier (rater 2 = salted-md5 10%-up/10%-down shifts, "
        "clamped): observed weighted disagreement an exact BIGINT, "
        "expected one a fixed 9-product chain over exact DECIMAL "
        "margins, kappa_w = 1 - N*O/E as ONE IEEE division; E = 0 "
        "degenerates pinned to 0 in integer space."
    ),
    tables=("orders",),
)


# --------------------------------------------------------------------------
# KS separation of the score distributions (round 13, window slot 46):
# the Kolmogorov-Smirnov distance between the positive-class and
# negative-class score CDFs — the classic scorecard discrimination
# metric reported beside AUC (credit-risk "KS statistic"), and the
# two-sample shape test stat_ks_drift applies to calendar halves,
# here applied to label classes. Rides the SAME staged
# per-distinct-score class table as ml_auc_roc / ml_pr_auc /
# ml_pauc_fpr10 (one events scan process-wide via the stage cache;
# two-stage prefix sums — per-bucket totals + declared-window bucket
# offsets + bucket-partitioned running sums — never a global window,
# never materialized ranks). Exactness: D = max_v |F1(v) - F0(v)| is
# computed as max over distinct v of |cum1*N - cum2*P| in
# DECIMAL(38,0) integer space (P*N-scaled, overflow-safe past BIGINT
# at ~1e9 x 1e9) with ONE IEEE division at the end; the reported
# threshold is the SMALLEST score attaining the max (deterministic
# tiebreak). One-class degenerates (P = 0 or N = 0) pin ks_stat to 0
# and the threshold to SQL NULL in integer space.
# --------------------------------------------------------------------------


def _ksep_diff(g: str, declared, p: str, q: str) -> str:
    """Per-distinct-score scaled CDF gap |cum1*N - cum2*P| — staged as
    its own checkpoint so the max pass and the argmax pass read a
    materialized table instead of re-deriving the prefix-sum pipeline
    (the plain-CTE draft measured 19 shuffles from a 3x re-derivation
    of this chain; staged it runs once)."""
    return f"""
WITH bt AS (
  SELECT bucket,
         CAST(SUM(c1) AS BIGINT) AS bc1,
         CAST(SUM(c2) AS BIGINT) AS bc2
  FROM {g} GROUP BY bucket
),
off AS (
  SELECT bucket,
         CAST(COALESCE(SUM(bc1) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o1,
         CAST(COALESCE(SUM(bc2) OVER (PARTITION BY __g ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o2
  FROM {declared("bt")}
),
c AS (
  SELECT g.v,
         o.o1 + SUM(g.c1) OVER (PARTITION BY g.bucket ORDER BY g.v
              ROWS UNBOUNDED PRECEDING) AS cum1,
         o.o2 + SUM(g.c2) OVER (PARTITION BY g.bucket ORDER BY g.v
              ROWS UNBOUNDED PRECEDING) AS cum2
  FROM {g} g JOIN off o ON o.bucket = g.bucket
)
SELECT c.v,
       ABS(CAST(c.cum1 AS DECIMAL(19,0)) * CAST({q} AS DECIMAL(19,0))
           - CAST(c.cum2 AS DECIMAL(19,0)) * CAST({p} AS DECIMAL(19,0)))
         AS diff
FROM c
"""


def _ksep_final(d: str, p: str, q: str) -> str:
    return f"""
WITH mx AS (SELECT MAX(diff) AS m FROM {d}),
thr AS (
  SELECT MIN(dd.v) AS t FROM {d} dd CROSS JOIN mx WHERE dd.diff = mx.m
)
SELECT CAST({p} AS BIGINT) AS n_pos, CAST({q} AS BIGINT) AS n_neg,
       CASE WHEN {p} = 0 OR {q} = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(mx.m AS DOUBLE)
                 / (CAST({p} AS DOUBLE) * CAST({q} AS DOUBLE))
       END AS ks_stat,
       CASE WHEN {p} = 0 OR {q} = 0 THEN CAST(NULL AS DOUBLE)
            ELSE thr.t
       END AS ks_threshold
FROM mx CROSS JOIN thr
"""


def _register_ks_separation() -> None:
    from aws_etl_spark.queries.sql_seams import duck_declared

    # oracle: one DuckDB statement — d's body is the diff chain as a
    # nested WITH, pulling p/q from the n CTE via CROSS JOIN (the
    # engine substitutes them as staged-scalar literals instead;
    # values identical, so the hashes match)
    duck_diff = _ksep_diff("g", duck_declared, "n.p", "n.q")
    assert duck_diff.startswith("\nWITH ")
    assert duck_diff.rstrip().endswith("FROM c")
    duck_diff = duck_diff.rstrip() + " CROSS JOIN n\n"
    duck_final = _ksep_final("d", "n.p", "n.q")
    assert duck_final.startswith("\nWITH ")
    assert "FROM mx CROSS JOIN thr" in duck_final
    duck_final = duck_final.replace(
        "FROM mx CROSS JOIN thr", "FROM n CROSS JOIN mx CROSS JOIN thr"
    )
    oracle = (
        f"WITH g AS ({_SCORE_CLASS_G}),\n"
        "n AS (SELECT CAST(SUM(c1) AS BIGINT) AS p,"
        " CAST(SUM(c2) AS BIGINT) AS q FROM g),\n"
        f"d AS ({duck_diff}),\n" + duck_final[len("\nWITH ") :]
    )
    staged_sql_query(
        "ml_ks_separation",
        ops=(
            ("view", "ksep_g", _SCORE_CLASS_G),
            (
                "scalars",
                ("ksep_p", "ksep_q"),
                "SELECT CAST(SUM(c1) AS BIGINT),"
                " CAST(SUM(c2) AS BIGINT) FROM ksep_g",
            ),
            (
                "view",
                "ksep_d",
                _ksep_diff("ksep_g", spark_declared, "{ksep_p}", "{ksep_q}"),
            ),
        ),
        final=_ksep_final("ksep_d", "{ksep_p}", "{ksep_q}"),
        oracle=oracle,
        category="ml",
        doc=(
            "Kolmogorov-Smirnov separation of the purchase-vs-rest "
            "score distributions: max CDF gap and its smallest "
            "attaining threshold off the shared staged class table, "
            "the gap kept exact in DECIMAL(38,0) integer space "
            "(cum1*N - cum2*P) with one IEEE division at the end; "
            "one-class degenerates pinned to 0/NULL."
        ),
        tables=("events",),
    )


_register_ks_separation()
