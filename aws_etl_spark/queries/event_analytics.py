"""Event-analytics patterns over the events table: funnels and
cohort retention — the product-analytics queries a warehouse serves
daily, expressed as single-pass conditional aggregations (no joins per
step, no self-joins per cohort cell).

Funnel: per user, the earliest timestamp of each step where every
step's ts must follow the previous step's; one groupBy(user) with
min(CASE WHEN ...) chains. Cohort: bucket users by first-seen week,
count distinct actives per (cohort, weeks-since) — two aggregations.
Both shapes shuffle once on user_id and scale linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_spark.queries.registry import (
    load_table,
    register,
    sql_query,
    staged_sql_query,
)

_FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view
  FROM events GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, p.t_view,
         MIN(CASE WHEN e.event_type = 'click'
                  AND CAST(e.ts AS TIMESTAMP) > p.t_view
             THEN CAST(e.ts AS TIMESTAMP) END) AS t_click
  FROM events e JOIN per_user p USING (user_id)
  GROUP BY e.user_id, p.t_view
),
s3 AS (
  SELECT e.user_id, s2.t_view, s2.t_click,
         MIN(CASE WHEN e.event_type = 'purchase'
                  AND CAST(e.ts AS TIMESTAMP) > s2.t_click
             THEN CAST(e.ts AS TIMESTAMP) END) AS t_purchase
  FROM events e JOIN s2 USING (user_id)
  GROUP BY e.user_id, s2.t_view, s2.t_click
)
SELECT CAST(COUNT(t_view) AS BIGINT) AS n_view,
       CAST(COUNT(t_click) AS BIGINT) AS n_click,
       CAST(COUNT(t_purchase) AS BIGINT) AS n_purchase
FROM s3
"""



def funnel_step_times(events, steps=("view", "click", "purchase")):
    """Per-user first-occurrence timestamp of each ordered funnel step
    (each step strictly after the previous step's first occurrence).
    Returns one row per user with t_<step> columns — the shared core
    of the funnel summary and the per-user mart."""
    first, *rest = steps
    out = events.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == first, F.col("ts"))
        ).alias(f"t_{first}")
    )
    prev = f"t_{first}"
    carried = ["user_id", prev]
    for step in rest:
        out = (
            events.join(out, "user_id")
            .groupBy(*carried)
            .agg(
                F.min(
                    F.when(
                        (F.col("event_type") == step)
                        & (F.col("ts") > F.col(prev)),
                        F.col("ts"),
                    )
                ).alias(f"t_{step}")
            )
        )
        prev = f"t_{step}"
        carried.append(prev)
    return out


@register(
    "events_funnel",
    oracle=_FUNNEL_ORACLE,
    category="streaming",
    tables=("events",),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase ordered funnel (each step strictly after
    the previous step's first occurrence)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_step_times(events).agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )


_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, DATE_TRUNC('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(DATEDIFF('day', f.cohort_week,
              DATE_TRUNC('week', CAST(e.ts AS TIMESTAMP))) / 7 AS INTEGER) AS weeks_since
  FROM events e JOIN firsts f USING (user_id)
)
SELECT cohort_week, weeks_since,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity
GROUP BY cohort_week, weeks_since
"""


@register(
    "events_cohort_retention",
    oracle=_COHORT_ORACLE,
    category="streaming",
    tables=("events",),
)
def q_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week,
    distinct actives per (cohort, weeks since)."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("weeks_since"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).alias("active_users")
    )


_PATTERN = "v[csv]*c[csv]*p"  # view ... click ... purchase, with any
# non-breaker events between (letters: v=view c=click p=purchase
# e=error s=signup — s/extra v/c are allowed in the gaps; e is the
# excluded breaker)

_SEQ_ORACLE = f"""
WITH strung AS (
  SELECT user_id,
         STRING_AGG(CASE event_type
                      WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                      WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
                      ELSE 's' END, ''
                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(LENGTH(seq) AS BIGINT) AS n_events,
       CAST(LEN(REGEXP_EXTRACT_ALL(seq, '{_PATTERN}')) AS BIGINT)
         AS n_matches,
       CAST(CASE WHEN REGEXP_MATCHES(seq, '{_PATTERN}')
                 THEN 1 ELSE 0 END AS BIGINT) AS matched
FROM strung
"""


@register(
    "events_sequence_pattern",
    oracle=_SEQ_ORACLE,
    category="timeseries",
    tables=("events",),
)
def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection: per user,
    count non-overlapping view→click→purchase funnels with no error
    event inside the window (regex over the user's ordered event-type
    string — the encode-then-regex trick that replaces a multi-way
    self-join; Spark has no MATCH_RECOGNIZE).

    One aggregation on user_id: the ordered event string builds via
    sort_array(collect_list(struct(ts, event_id, char))) — per-user
    state is the user's own event count, the same bound any
    sessionized operator carries; at 100 TB cap the string per
    (user, day) instead of (user). Both regex engines (Java util.regex
    / RE2) agree on this pattern class (character classes + star —
    leftmost non-overlapping)."""
    events = load_table(spark, sf_dir, "events")
    chr_col = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "error", "e")
        .otherwise("s")
    )
    strung = (
        events.select(
            "user_id",
            F.struct("ts", "event_id", chr_col.alias("ch")).alias("evt"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("evt")), lambda s: s["ch"]
                ),
                "",
            ).alias("seq")
        )
    )
    return strung.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.size(
            F.expr(f"regexp_extract_all(seq, '{_PATTERN}', 0)")
        ).cast("bigint").alias("n_matches"),
        F.expr(f"CAST(CASE WHEN seq RLIKE '{_PATTERN}' THEN 1 ELSE 0 END AS BIGINT)").alias(
            "matched"
        ),
    )


_MART_ORACLE = """
WITH base AS (
  SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         MIN(CAST(ts AS TIMESTAMP)) AS first_seen,
         MAX(CAST(ts AS TIMESTAMP)) AS last_seen,
         DATE_TRUNC('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week,
         MIN(CASE WHEN event_type = 'view'
                  THEN CAST(ts AS TIMESTAMP) END) AS t_view
  FROM events GROUP BY user_id
),
c AS (
  SELECT e.user_id,
         MIN(CASE WHEN e.event_type = 'click'
                  AND CAST(e.ts AS TIMESTAMP) > b.t_view
             THEN CAST(e.ts AS TIMESTAMP) END) AS t_click
  FROM events e JOIN base b USING (user_id) GROUP BY e.user_id
),
p AS (
  SELECT e.user_id,
         MIN(CASE WHEN e.event_type = 'purchase'
                  AND CAST(e.ts AS TIMESTAMP) > c.t_click
             THEN CAST(e.ts AS TIMESTAMP) END) AS t_purchase
  FROM events e JOIN c USING (user_id) GROUP BY e.user_id
),
s AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR CAST(ts AS TIMESTAMP) >
                   LAG(CAST(ts AS TIMESTAMP)) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
g AS (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM s
),
sess AS (
  SELECT user_id, MAX(session_seq) AS n_sessions,
         MAX(cnt) AS max_session_events
  FROM (SELECT user_id, session_seq, COUNT(*) AS cnt
        FROM g GROUP BY user_id, session_seq) x
  GROUP BY user_id
)
SELECT b.user_id, CAST(b.n_events AS BIGINT) AS n_events,
       b.total_value, b.first_seen, b.last_seen, b.cohort_week,
       CAST(sess.n_sessions AS BIGINT) AS n_sessions,
       CAST(sess.max_session_events AS BIGINT) AS max_session_events,
       CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS converted
FROM base b
JOIN sess USING (user_id)
JOIN p USING (user_id)
"""


@register(
    "events_e2e_mart",
    oracle=_MART_ORACLE,
    category="streaming",
    tables=("events",),
)
def q_events_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-user analytics mart as ONE composed plan: base activity
    stats + gap-sessionization rollup + the ordered view→click→
    purchase funnel flag — the events-side counterpart of
    corpus_e2e_pipeline. Every branch keys on user_id, so the joins
    reuse one hash partitioning (AQE coalesces the exchanges); the
    composition adds no kernels beyond the registry's own session and
    funnel operators.

    Round 10: the three branches (base stats, funnel join-back chain,
    sessionization) consumed the scan independently — 5 logical events
    scans in the plan census. The needed 5-column projection is
    checkpointed once and feeds every branch (the staged rescan-family
    trade: one narrow materialization vs five fact scans)."""
    from aws_etl_spark.streaming.sessions import session_rollup

    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type", "event_id", "value")
        .localCheckpoint(eager=True)
    )
    base = events.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.date_trunc("week", F.min("ts")).alias("cohort_week"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
    )
    p = funnel_step_times(events).select("user_id", "t_purchase")
    sess = (
        session_rollup(events, gap_minutes=30)
        .groupBy("user_id")
        .agg(
            F.max("session_seq").cast("bigint").alias("n_sessions"),
            F.max("n_events").cast("bigint").alias("max_session_events"),
        )
    )
    return (
        base.join(sess, "user_id")
        .join(p, "user_id")
        .select(
            "user_id",
            "n_events",
            "total_value",
            "first_seen",
            "last_seen",
            "cohort_week",
            "n_sessions",
            "max_session_events",
            F.when(F.col("t_purchase").isNotNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("converted"),
        )
    )


def _gap_hist_sql(lag_expr: str, us_expr: str) -> str:
    # us_expr: microseconds-since-epoch — Spark unix_micros() and
    # DuckDB epoch_us() are exactly equal (the established seam);
    # integer DIV gives identical whole-second gaps on both engines
    return f"""
WITH gaps AS (
  SELECT user_id,
         CAST(ts AS TIMESTAMP) AS t,
         {lag_expr} AS prev_t
  FROM events
),
d AS (
  SELECT user_id,
         CAST(({us_expr.format(col="t")} - {us_expr.format(col="prev_t")})
              DIV 1000000 AS BIGINT) AS gap_s
  FROM gaps WHERE prev_t IS NOT NULL
)
SELECT CASE WHEN gap_s < 60 THEN 'lt_1m'
            WHEN gap_s < 600 THEN 'lt_10m'
            WHEN gap_s < 3600 THEN 'lt_1h'
            WHEN gap_s < 86400 THEN 'lt_1d'
            ELSE 'ge_1d' END AS gap_bucket,
       COUNT(*) AS n_gaps,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
FROM d
GROUP BY 1
"""


_GAP_LAG = (
    "LAG(CAST(ts AS TIMESTAMP)) OVER "
    "(PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)"
)

sql_query(
    "events_gap_histogram",
    _gap_hist_sql(_GAP_LAG, "unix_micros({col})"),
    oracle=_gap_hist_sql(_GAP_LAG, "epoch_us({col})").replace(" DIV ", " // "),
    category="events",
    doc=(
        "Inter-event gap histogram per user stream (the sessionizer's "
        "companion diagnostic: where should the session timeout sit?): "
        "LAG over (user, time, id-tiebreak) → integer second gaps → "
        "fixed buckets. Gap seconds come from unix_micros ≡ epoch_us "
        "integer DIV (the portable epoch seam — gaps are positive, "
        "so DIV and // agree). One "
        "window shuffle + one map-side histogram aggregate."
    ),
    tables=("events",),
)


# --------------------------------------------------------------------------
# Exact rolling 7-day distinct actives (the WAU curve). Sliding
# distinct counts do NOT decompose into partial sums, so the naive
# shapes are a whole-stream window (single partition — unusable) or a
# per-day re-scan (7x the I/O). The scale shape used here: reduce the
# stream to DISTINCT (user, day) pairs first (THE big map-side-
# combined shuffle — everything after is bounded by users x days),
# then explode each pair onto the <= 7 calendar days it covers (an
# equi-shape, no theta/range join) and count distinct users per day,
# keeping only days that actually occur. At 100 TB the pair reduce is
# the only data-sized stage; the x7 fan-out multiplies a far smaller
# relation.
# --------------------------------------------------------------------------

def _rolling_active_sql(seven: str, dateadd: str) -> str:
    return f"""
WITH ud AS (
  SELECT DISTINCT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM ud),
cover AS (
  SELECT {dateadd} AS day, ud.user_id
  FROM ud CROSS JOIN ({seven}) o
)
SELECT d.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS active_7d
FROM days d JOIN cover c ON c.day = d.day
GROUP BY d.day
"""


sql_query(
    "events_rolling_distinct_users",
    _rolling_active_sql(
        "SELECT explode(sequence(0, 6)) AS i",
        "CAST(DATE_ADD(CAST(ud.day AS DATE), o.i) AS TIMESTAMP)",
    ),
    oracle=_rolling_active_sql(
        "SELECT unnest(range(0, 7)) AS i",
        "CAST(CAST(ud.day AS DATE) + CAST(o.i AS INTEGER) AS TIMESTAMP)",
    ),
    category="events",
    doc=(
        "Exact 7-day rolling distinct active users per day (the WAU "
        "curve): distinct (user, day) pairs first, each pair exploded "
        "onto the 7 days it covers (equi-join, never a range join), "
        "distinct-count per day over days that occur. The pair reduce "
        "is the only data-sized stage; exact counting replaces the "
        "usual sliding-HLL approximation."
    ),
    tables=("events",),
)


# --------------------------------------------------------------------------
# Session-boundary A/B exposure attribution with a two-model uplift
# readout. stat_ab_experiment reads out an ALL-USERS experiment; real
# feature experiments only count a user from the moment a session
# actually showed the feature (exposure), or dilution buries the
# effect. Assignment is the shared salted-md5 coin (sticky, no
# assignment table); exposure = the START of the user's first session
# containing a qualifying event (event_type = 'click' — the feature
# surface); conversion = a purchase within the 24h attribution window
# after exposure (ever-after conversion is a degenerate 100% on this
# synthetic month — every user purchases eventually).
# The readout is the two-model (T-learner at the aggregate level)
# uplift: per-arm conversion rate among exposed users, differenced.
# All counts are exact BIGINTs; each rate is one IEEE division and
# the uplift is one subtraction of those — identical op sequence on
# both engines. Plan: the user-partitioned sessionization window
# (parallelism grows with users), two user-keyed reduces, a per-user
# purchase-after-exposure join, then constant-size arm aggregates.
# --------------------------------------------------------------------------

def _uplift_sql(bucket, vchar: str, declared) -> str:
    return f"""
WITH s AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR CAST(ts AS TIMESTAMP) >
                   LAG(CAST(ts AS TIMESTAMP)) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
g AS (
  SELECT user_id, ts, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM s
),
sess AS (
  SELECT user_id, session_seq, MIN(ts) AS session_start,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           AS has_exposure
  FROM g GROUP BY user_id, session_seq
),
exposure AS (
  SELECT user_id, MIN(session_start) AS exposure_ts
  FROM sess WHERE has_exposure = 1 GROUP BY user_id
),
conv AS (
  -- 24h attribution window: "ever purchases after exposure" is a
  -- degenerate 100% on this synthetic month (every user purchases
  -- eventually), so the readout counts purchases attributed to the
  -- exposure itself — the standard conversion-window definition
  SELECT x.user_id,
         MAX(CASE WHEN e.event_type = 'purchase'
                  AND CAST(e.ts AS TIMESTAMP) >= x.exposure_ts
                  AND CAST(e.ts AS TIMESTAMP)
                      < x.exposure_ts + INTERVAL 24 HOUR
             THEN 1 ELSE 0 END) AS converted
  FROM exposure x JOIN events e ON e.user_id = x.user_id
  GROUP BY x.user_id
),
arms AS (
  SELECT ({bucket(f"CONCAT('exp2:', CAST(user_id AS {vchar}))")} % 2)
           AS variant,
         converted
  FROM conv
),
v AS (
  SELECT variant,
         CAST(COUNT(*) AS BIGINT) AS exposed_users,
         CAST(SUM(converted) AS BIGINT) AS converters
  FROM arms GROUP BY variant
),
r AS (
  SELECT variant, exposed_users, converters,
         CAST(converters AS DOUBLE) / exposed_users AS conversion_rate
  FROM v
)
SELECT variant, exposed_users, converters, conversion_rate,
       MAX(CASE WHEN variant = 1 THEN conversion_rate END)
         OVER (PARTITION BY __g)
       - MAX(CASE WHEN variant = 0 THEN conversion_rate END)
         OVER (PARTITION BY __g) AS uplift
FROM {declared("r")}
ORDER BY variant
"""


def _uplift_spark() -> str:
    from aws_etl_spark.queries.sql_seams import spark_declared
    from aws_etl_spark.queries.stats_queries import _spark_bucket

    return _uplift_sql(_spark_bucket, "STRING", spark_declared)


def _uplift_duck() -> str:
    from aws_etl_spark.ops.corpus import duckdb_bucket_sql
    from aws_etl_spark.queries.sql_seams import duck_declared

    return _uplift_sql(duckdb_bucket_sql, "VARCHAR", duck_declared)


sql_query(
    "events_ab_exposure_uplift",
    _uplift_spark(),
    oracle=_uplift_duck(),
    category="events",
    doc=(
        "Session-boundary A/B exposure attribution: md5-coin "
        "assignment, exposure = start of the first 30-min-gap session "
        "containing a click, conversion = purchase within the 24h "
        "attribution window after exposure, read out as per-arm "
        "conversion among EXPOSED users plus the two-model uplift "
        "difference. Exact counts, two IEEE divisions and one "
        "subtraction at the boundary."
    ),
    tables=("events",),
)


# --------------------------------------------------------------------------
# Kaplan-Meier time-to-event survival — the product-analytics
# estimator for "how long until a user first does X" that handles
# CENSORING correctly (users who haven't done X by the study horizon
# are not failures, and naive waiting-time averages that drop them
# are biased). Event of interest = first high-value purchase
# (value >= 250 — rare enough that most users remain censored, the
# regime KM exists for; activity-based churn is degenerate on this
# synthetic month where every user stays active to the horizon).
# Duration = days from a user's first event to the qualifying
# purchase (death) or to the horizon (censored). The product-limit
# estimator S(t) = prod(1 -
# d_i/n_i) is computed in log space: each factor's ln is
# micro-quantized (the corpus FLOOR(LN(x)*1e6) idiom) so the running
# product is an exact BIGINT prefix sum over the day spine, with the
# at-risk counts n_i derived from the same spine by prefix-summing
# exits. The spine is calendar-bounded (<= 31 distinct durations), so
# both windows run inside the declared-single-partition seam — the
# CUSUM/KS shape. The only data-sized stage is the per-user reduce.
# --------------------------------------------------------------------------

def _km_sql(daydiff, declared) -> str:
    return f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
  FROM events
),
horizon AS (SELECT CAST(MAX(ts) AS DATE) AS study_end FROM e),
u AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS birth,
         MIN(CASE WHEN event_type = 'purchase' AND value >= 250
                  THEN CAST(ts AS DATE) END) AS hit
  FROM e GROUP BY user_id
),
obs AS (
  SELECT CASE WHEN u.hit IS NOT NULL
              THEN {daydiff("u.birth", "u.hit")}
              ELSE {daydiff("u.birth", "h.study_end")} END AS t,
         CASE WHEN u.hit IS NOT NULL THEN 1 ELSE 0 END AS d
  FROM u CROSS JOIN horizon h
),
per_t AS (
  SELECT t, CAST(SUM(d) AS BIGINT) AS deaths,
         CAST(COUNT(*) AS BIGINT) AS exits
  FROM obs GROUP BY t
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM obs),
spine AS (
  SELECT p.t, p.deaths, p.exits, tot.n_users FROM per_t p CROSS JOIN tot
),
risk AS (
  SELECT t, deaths, exits,
         CAST(n_users - COALESCE(
           SUM(exits) OVER (PARTITION BY __g ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS at_risk
  FROM {declared("spine")}
),
terms AS (
  SELECT t, deaths, exits - deaths AS censored, at_risk,
         CASE WHEN deaths = 0 THEN CAST(0 AS BIGINT)
              WHEN deaths < at_risk THEN
                CAST(FLOOR(LN(CAST(at_risk - deaths AS DOUBLE) / at_risk)
                           * 1000000) AS BIGINT)
              ELSE CAST(-138000000 AS BIGINT) END AS lq,
         CASE WHEN deaths >= at_risk THEN 1 ELSE 0 END AS extinct
  FROM risk
),
km AS (
  SELECT t, deaths, censored, at_risk,
         CAST(SUM(lq) OVER (PARTITION BY __g ORDER BY t
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS log_surv_micros,
         MAX(extinct) OVER (PARTITION BY __g ORDER BY t
                            ROWS UNBOUNDED PRECEDING) AS extinct_cum
  FROM {declared("terms")}
)
SELECT t AS duration_days, at_risk, deaths, censored, log_surv_micros,
       CASE WHEN extinct_cum = 1 THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR(EXP(CAST(log_surv_micros AS DOUBLE) / 1000000)
                            * 1000000) AS BIGINT) END AS km_survival_e6
FROM km
ORDER BY t
"""


def _km_spark() -> str:
    from aws_etl_spark.queries.sql_seams import spark_declared

    return _km_sql(lambda a, b: f"DATEDIFF({b}, {a})", spark_declared)


def _km_duck() -> str:
    from aws_etl_spark.queries.sql_seams import duck_declared

    return _km_sql(lambda a, b: f"DATE_DIFF('day', {a}, {b})", duck_declared)


def _km_spark_staged() -> tuple:
    from aws_etl_spark.queries.sql_seams import spark_declared

    ops = (
        (
            "view",
            "km_u",
            """
            SELECT user_id, CAST(MIN(ts) AS DATE) AS birth,
                   MIN(CASE WHEN event_type = 'purchase' AND value >= 250
                            THEN CAST(ts AS DATE) END) AS hit,
                   MAX(ts) AS last_ts
            FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                         event_type, value
                  FROM events)
            GROUP BY user_id
            """,
        ),
        (
            "view",
            "km_per_t",
            """
            WITH horizon AS (
              SELECT CAST(MAX(last_ts) AS DATE) AS study_end FROM km_u
            ),
            obs AS (
              SELECT CASE WHEN u.hit IS NOT NULL
                          THEN DATEDIFF(u.hit, u.birth)
                          ELSE DATEDIFF(h.study_end, u.birth) END AS t,
                     CASE WHEN u.hit IS NOT NULL THEN 1 ELSE 0 END AS d
              FROM km_u u CROSS JOIN horizon h
            )
            SELECT t, CAST(SUM(d) AS BIGINT) AS deaths,
                   CAST(COUNT(*) AS BIGINT) AS exits
            FROM obs GROUP BY t
            """,
        ),
        ("scalar", "KMNU", "SELECT CAST(SUM(exits) AS BIGINT) FROM km_per_t"),
    )
    final = f"""
    WITH risk AS (
      SELECT t, deaths, exits,
             CAST({{KMNU}} - COALESCE(
               SUM(exits) OVER (PARTITION BY __g ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS at_risk
      FROM {spark_declared("km_per_t")}
    ),
    terms AS (
      SELECT t, deaths, exits - deaths AS censored, at_risk,
             CASE WHEN deaths = 0 THEN CAST(0 AS BIGINT)
                  WHEN deaths < at_risk THEN
                    CAST(FLOOR(LN(CAST(at_risk - deaths AS DOUBLE) / at_risk)
                               * 1000000) AS BIGINT)
                  ELSE CAST(-138000000 AS BIGINT) END AS lq,
             CASE WHEN deaths >= at_risk THEN 1 ELSE 0 END AS extinct
      FROM risk
    ),
    km AS (
      SELECT t, deaths, censored, at_risk,
             CAST(SUM(lq) OVER (PARTITION BY __g ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS log_surv_micros,
             MAX(extinct) OVER (PARTITION BY __g ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS extinct_cum
      FROM {spark_declared("terms")}
    )
    SELECT t AS duration_days, at_risk, deaths, censored, log_surv_micros,
           CASE WHEN extinct_cum = 1 THEN CAST(0 AS BIGINT)
                ELSE CAST(FLOOR(EXP(CAST(log_surv_micros AS DOUBLE) / 1000000)
                                * 1000000) AS BIGINT) END AS km_survival_e6
    FROM km
    ORDER BY t
    """
    return ops, final


_KM_OPS, _KM_FINAL = _km_spark_staged()

staged_sql_query(
    "events_survival_km",
    # Round-10 rescan fix (x4 band): e fed horizon and the per-user
    # rollup, and obs re-derived both into per_t and tot — 4 logical
    # events scans. ONE scan into the checkpointed per-user table
    # (birth/hit/last_ts); the horizon is a 1-row agg over it, the
    # user count a driver literal, and the day-spine prefix sums run
    # on the checkpointed per_t rollup.
    ops=_KM_OPS,
    final=_KM_FINAL,
    oracle=_km_duck(),
    category="events",
    doc=(
        "Kaplan-Meier time-to-event survival with right-censoring: "
        "event = first high-value purchase (value >= 250), duration = "
        "first event to the hit or to the horizon (censored); S(t) = "
        "prod(1 - "
        "d_i/n_i) as an exact micro-quantized log-space prefix sum "
        "over the <=31-row day spine (declared-single-partition), "
        "at-risk counts by prefix-summing exits. Per-user reduce is "
        "the only data-sized stage."
    ),
    tables=("events",),
)


# --------------------------------------------------------------------------
# Theil–Sen robust trend on daily event volume (round 9). The
# outlier-proof slope every volume monitor wants (one anomalous day
# drags OLS, but not the median of pairwise slopes). Declared-seam
# shape like the KM spine: the daily rollup is the only data-sized
# stage; the pairwise self-join runs over the ≤31-row day spine
# (≤465 pairs), and the median is an exact order statistic — rank by
# (slope, t1, t2), pick the middle one or two rows, AVG them (a
# 2-value IEEE mean is commutative, so cross-engine order is moot).
# Each slope is ONE IEEE division of two exact BIGINTs; no
# transcendentals anywhere.
# --------------------------------------------------------------------------


def _theilsen_sql(epoch_days, intdiv, declared) -> str:
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS v
  FROM events GROUP BY CAST(ts AS DATE)
),
idx AS (SELECT {epoch_days("d")} AS t, v FROM daily),
pairs AS (
  SELECT a.t AS t1, b.t AS t2,
         CAST(b.v - a.v AS DOUBLE) / (b.t - a.t) AS slope
  FROM idx a JOIN idx b ON b.t > a.t
),
ranked AS (
  SELECT slope,
         ROW_NUMBER() OVER (PARTITION BY __g
                            ORDER BY slope, t1, t2) AS rn
  FROM {declared("pairs")}
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
SELECT nd.n_days, m.n_pairs,
       (SELECT AVG(r.slope) FROM ranked r CROSS JOIN m
        WHERE r.rn IN ({intdiv("m.n_pairs + 1", "2")}, {intdiv("m.n_pairs + 2", "2")}))
         AS slope_per_day
FROM nd CROSS JOIN m
"""


def _theilsen_spark() -> str:
    from aws_etl_spark.queries.sql_seams import spark_declared

    return _theilsen_sql(
        lambda d: f"DATEDIFF({d}, DATE '1970-01-01')",
        lambda a, b: f"({a}) DIV ({b})",
        spark_declared,
    )


def _theilsen_duck() -> str:
    from aws_etl_spark.queries.sql_seams import duck_declared

    return _theilsen_sql(
        lambda d: f"DATEDIFF('day', DATE '1970-01-01', {d})",
        lambda a, b: f"({a}) // ({b})",
        duck_declared,
    )


def _theilsen_staged_ops():
    from aws_etl_spark.queries.sql_seams import spark_declared

    return (
        (
            "view",
            "theilsen_idx",
            """
            SELECT DATEDIFF(d, DATE '1970-01-01') AS t, v
            FROM (SELECT CAST(ts AS DATE) AS d,
                         CAST(COUNT(*) AS BIGINT) AS v
                  FROM events GROUP BY CAST(ts AS DATE))
            """,
        ),
        (
            "view",
            "theilsen_pairs",
            """
            SELECT a.t AS t1, b.t AS t2,
                   CAST(b.v - a.v AS DOUBLE) / (b.t - a.t) AS slope
            FROM theilsen_idx a JOIN theilsen_idx b ON b.t > a.t
            """,
        ),
        (
            "scalars",
            ("TSND", "TSNP"),
            "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM theilsen_idx),"
            " (SELECT CAST(COUNT(*) AS BIGINT) FROM theilsen_pairs)",
        ),
    ), spark_declared


_TS_OPS, _ts_declared = _theilsen_staged_ops()

staged_sql_query(
    "events_theilsen_trend",
    # Round-10 rescan fix (tier 2; r9 ADVICE item 5 — the builder's
    # own "≤4 scans" audit undercounted this r9 addition at 7): the
    # idx CTE sat on BOTH sides of the pairwise self-join and under
    # nd, so Catalyst re-derived the daily rollup (and its events
    # scan) per consumer. Staged: ONE events scan into the ≤31-row
    # checkpointed day spine; the ≤465-pair table and its counts
    # follow from the checkpoint.
    ops=_TS_OPS,
    final=f"""
    WITH ranked AS (
      SELECT slope,
             ROW_NUMBER() OVER (PARTITION BY __g
                                ORDER BY slope, t1, t2) AS rn
      FROM {_ts_declared("theilsen_pairs")}
    )
    SELECT {{TSND}} AS n_days, {{TSNP}} AS n_pairs,
           (SELECT AVG(r.slope) FROM ranked r
            WHERE r.rn IN (({{TSNP}} + 1) DIV (2), ({{TSNP}} + 2) DIV (2)))
             AS slope_per_day
    """,
    oracle=_theilsen_duck(),
    category="events",
    doc=(
        "Theil–Sen robust trend of daily event volume: median of all "
        "pairwise day-to-day slopes over the ≤31-day spine, as an "
        "exact order statistic (rank, middle 1-2 rows, commutative "
        "2-value mean). One daily rollup is the only data-sized stage "
        "— checkpointed since round 10 so it executes exactly once."
    ),
    tables=("events",),
)
