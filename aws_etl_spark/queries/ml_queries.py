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

from aws_etl_spark.queries.registry import sql_query

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


sql_query(
    "ml_negative_sampling",
    _neg_sql(_SPARK_PAIR_COIN, _SPARK_CUST_COIN),
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
        "coins."
    ),
    tables=("orders", "lineitem", "part"),
)
