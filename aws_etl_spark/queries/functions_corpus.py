"""Scalar / array / JSON function corpus (SURVEY.md §2.8).

The reference's own scalar surface is: ``unix_timestamp(col,'M/d/yyyy')``,
``from_unixtime``, ``cast``, nested ``replace``, ``NVL``
(k8s/codes/variables.py:27-60). Those exact semantics are covered in
``func_date_parse`` / ``func_conditional``; the rest is the broader
builtin surface the oracle demands.

Dialect notes (Spark vs DuckDB) are inline where the oracle diverges:
DuckDB ``regexp_replace`` needs the ``'g'`` flag, ``strftime``/
``strptime`` use C formats, ``unnest`` replaces ``explode``.
"""

from __future__ import annotations

from aws_etl_spark.queries.registry import sql_query

sql_query(
    "func_string",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           TRIM('  ' || c_name || ' ') AS name_trim,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           c_name || '/' || c_mktsegment AS name_concat,
           LPAD(CAST(c_custkey AS STRING), 10, '0') AS key_padded,
           REVERSE(c_mktsegment) AS seg_rev,
           REPLACE(c_name, 'Customer', 'Cust') AS name_replaced,
           POSITION('0' IN c_name) AS first_zero,
           REPEAT(c_mktsegment, 2) AS seg_twice,
           MD5(c_name) AS name_md5
    FROM customer
    """,
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           TRIM('  ' || c_name || ' ') AS name_trim,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           c_name || '/' || c_mktsegment AS name_concat,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           REVERSE(c_mktsegment) AS seg_rev,
           REPLACE(c_name, 'Customer', 'Cust') AS name_replaced,
           POSITION('0' IN c_name) AS first_zero,
           REPEAT(c_mktsegment, 2) AS seg_twice,
           MD5(c_name) AS name_md5
    FROM customer
    """,
    category="function",
    doc="String builtin surface incl. md5 fingerprint.",
    tables=("customer",),
)

sql_query(
    "func_regexp",
    """
    SELECT p_partkey, p_name,
           REGEXP_REPLACE(p_name, '[aeiou]', '_') AS devoweled,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
           REGEXP_LIKE(p_name, '^[a-z]+ ') AS starts_lower_word
    FROM part
    """,
    oracle="""
    SELECT p_partkey, p_name,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
           REGEXP_MATCHES(p_name, '^[a-z]+ ') AS starts_lower_word
    FROM part
    """,
    category="function",
    doc="Regexp replace/extract/match (DuckDB needs global flag).",
    tables=("part",),
)

sql_query(
    "func_date_extract",
    """
    SELECT o_orderkey,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mo,
           DAY(o_orderdate) AS dy,
           QUARTER(o_orderdate) AS qtr,
           DATE_TRUNC('month', o_orderdate) AS month_start,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(MAKE_DATE(YEAR(o_orderdate), MONTH(o_orderdate), 1) AS TIMESTAMP)
             AS first_of_month
    FROM orders WHERE o_orderkey < 200
    """,
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mo,
           DAY(o_orderdate) AS dy,
           QUARTER(o_orderdate) AS qtr,
           DATE_TRUNC('month', o_orderdate) AS month_start,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(MAKE_DATE(YEAR(o_orderdate), MONTH(o_orderdate), 1) AS TIMESTAMP)
             AS first_of_month
    FROM orders WHERE o_orderkey < 200
    """,
    category="function",
    doc=(
        "Date part extraction + truncation + construction. Corpus "
        "convention: temporal outputs are TIMESTAMP (or string), never "
        "DATE — pandas renders DATE ambiguously across engines."
    ),
    tables=("orders",),
)

sql_query(
    "func_date_parse",
    """
    SELECT o_orderkey,
           DATE_FORMAT(o_orderdate, 'M/d/yyyy') AS us_date,
           CAST(TRY_TO_DATE(DATE_FORMAT(o_orderdate, 'M/d/yyyy'), 'M/d/yyyy')
                AS TIMESTAMP) AS reparsed,
           CAST(FROM_UNIXTIME(UNIX_TIMESTAMP(DATE_FORMAT(o_orderdate, 'M/d/yyyy'),
                                             'M/d/yyyy'), 'yyyy-MM-dd') AS TIMESTAMP)
             AS via_epoch,
           CAST(TRY_TO_DATE('not a date', 'M/d/yyyy') AS TIMESTAMP) AS bad_parse
    FROM orders WHERE o_orderkey < 500
    """,
    oracle="""
    SELECT o_orderkey,
           STRFTIME(o_orderdate, '%-m/%-d/%Y') AS us_date,
           CAST(CAST(TRY_STRPTIME(STRFTIME(o_orderdate, '%-m/%-d/%Y'), '%-m/%-d/%Y')
                     AS DATE) AS TIMESTAMP) AS reparsed,
           CAST(CAST(TRY_STRPTIME(STRFTIME(o_orderdate, '%-m/%-d/%Y'), '%-m/%-d/%Y')
                     AS DATE) AS TIMESTAMP) AS via_epoch,
           CAST(TRY_STRPTIME('not a date', '%-m/%-d/%Y') AS TIMESTAMP) AS bad_parse
    FROM orders WHERE o_orderkey < 500
    """,
    category="function",
    doc=(
        "Reference date semantics (variables.py:27): M/d/yyyy string → date, "
        "incl. the unix_timestamp/from_unixtime round-trip and NULL on "
        "malformed input via TRY_TO_DATE — immune to the session's ANSI mode."
    ),
    tables=("orders",),
)

sql_query(
    "func_math",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ABS(l_quantity - 25) AS DOUBLE) AS dist_from_25,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)), 2) AS DOUBLE)
             AS price_rounded,
           CAST(SQRT(l_quantity) AS DOUBLE) AS qty_sqrt,
           CAST(SIGN(l_quantity - 25) AS DOUBLE) AS qty_sign,
           CAST(MOD(l_orderkey, 7) AS BIGINT) AS key_mod,
           CAST(GREATEST(l_quantity, 10.0) AS DOUBLE) AS qty_floor10,
           CAST(LEAST(l_quantity, 40.0) AS DOUBLE) AS qty_cap40,
           CAST(l_quantity * l_quantity AS DOUBLE) AS qty_sq
    FROM lineitem WHERE l_orderkey < 300
    """,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ABS(l_quantity - 25) AS DOUBLE) AS dist_from_25,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)), 2) AS DOUBLE)
             AS price_rounded,
           CAST(SQRT(l_quantity) AS DOUBLE) AS qty_sqrt,
           CAST(SIGN(l_quantity - 25) AS DOUBLE) AS qty_sign,
           CAST(MOD(l_orderkey, 7) AS BIGINT) AS key_mod,
           CAST(GREATEST(l_quantity, 10.0) AS DOUBLE) AS qty_floor10,
           CAST(LEAST(l_quantity, 40.0) AS DOUBLE) AS qty_cap40,
           CAST(l_quantity * l_quantity AS DOUBLE) AS qty_sq
    FROM lineitem WHERE l_orderkey < 300
    """,
    category="function",
    doc=(
        "Math builtins (IEEE-deterministic scalar ops only). Every "
        "numeric output carries a final CAST to DOUBLE/BIGINT on both "
        "dialects so the driver hashes identical representations "
        "(Spark FLOOR→bigint vs DuckDB FLOOR→double, SIGN double vs "
        "int8, ROUND decimal vs double)."
    ),
    tables=("lineitem",),
)

sql_query(
    "func_conditional",
    """
    SELECT s_suppkey,
           NVL(NULLIF(s_name, ''), 'unknown') AS name_or_default,
           COALESCE(NULLIF(s_acctbal, 0.0), -1.0) AS bal_or_flag,
           CASE WHEN s_acctbal > 5000 THEN 'rich'
                WHEN s_acctbal > 0 THEN 'ok'
                ELSE 'poor' END AS bal_band,
           IF(s_nationkey < 12, 'low', 'high') AS nation_band
    FROM supplier
    """,
    oracle="""
    SELECT s_suppkey,
           COALESCE(NULLIF(s_name, ''), 'unknown') AS name_or_default,
           COALESCE(NULLIF(s_acctbal, 0.0), -1.0) AS bal_or_flag,
           CASE WHEN s_acctbal > 5000 THEN 'rich'
                WHEN s_acctbal > 0 THEN 'ok'
                ELSE 'poor' END AS bal_band,
           IF(s_nationkey < 12, 'low', 'high') AS nation_band
    FROM supplier
    """,
    category="function",
    doc="NVL (reference variables.py:60) / coalesce / nullif / if / case.",
    tables=("supplier",),
)

sql_query(
    "func_json",
    """
    SELECT event_id, event_type,
           CAST(GET_JSON_OBJECT(props, '$.k') AS INT) AS k_value
    FROM events
    WHERE GET_JSON_OBJECT(props, '$.k') IS NOT NULL
    """,
    oracle="""
    SELECT event_id, event_type,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_value
    FROM events
    WHERE JSON_EXTRACT_STRING(props, '$.k') IS NOT NULL
    """,
    category="function",
    doc="JSON path extraction from a string column (events.props).",
    tables=("events",),
)

sql_query(
    "func_array",
    """
    SELECT vec_id,
           CAST(SIZE(embedding) AS BIGINT) AS dim,
           CAST(ELEMENT_AT(embedding, 1) AS DOUBLE) AS first_el,
           CAST(ELEMENT_AT(embedding, 1) AS DOUBLE)
             + 2 * CAST(ELEMENT_AT(embedding, 2) AS DOUBLE) AS lin_comb,
           ARRAY_JOIN(TRANSFORM(SLICE(embedding, 1, 3),
               x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                         AS STRING)), ',') AS head3
    FROM embeddings WHERE vec_id < 100
    """,
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_el,
           CAST(embedding[1] AS DOUBLE) + 2 * CAST(embedding[2] AS DOUBLE)
             AS lin_comb,
           ARRAY_TO_STRING(LIST_TRANSFORM(embedding[1:3],
               x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                         AS VARCHAR)), ',') AS head3
    FROM embeddings WHERE vec_id < 100
    """,
    category="function",
    doc=(
        "Array access/slice/size over embedding column (1-based both "
        "engines). The slice is rendered as a CSV of integer-quantized "
        "elements (floor(x*1e4)): raw array columns crash the driver's "
        "canonicalizer, and float→string rendering differs across "
        "engines, while float→double→floor is bit-deterministic."
    ),
    tables=("embeddings",),
)

sql_query(
    "func_explode_wordcount",
    """
    SELECT word, COUNT(*) AS n
    FROM (SELECT EXPLODE(SPLIT(text, ' ')) AS word FROM documents) t
    WHERE word <> ''
    GROUP BY word
    """,
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents) t
    WHERE word <> ''
    GROUP BY word
    """,
    category="function",
    doc="explode/unnest lateral word count over documents.",
    tables=("documents",),
)

sql_query(
    "func_collect_agg",
    """
    SELECT o_orderstatus,
           ARRAY_JOIN(SORT_ARRAY(COLLECT_SET(o_orderpriority)), '|') AS priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
    oracle="""
    SELECT o_orderstatus,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderpriority)), '|') AS priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
    category="function",
    doc="Set-collecting aggregation rendered order-stable.",
    tables=("orders",),
)

sql_query(
    "func_bitwise",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           o_orderkey ^ 21845 AS xored,
           SHIFTLEFT(o_orderkey, 2) AS shl2,
           SHIFTRIGHT(o_orderkey, 3) AS shr3,
           BIT_COUNT(o_orderkey) AS popcount
    FROM orders
    WHERE o_orderkey < 1000
    """,
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           XOR(o_orderkey, 21845) AS xored,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3,
           BIT_COUNT(o_orderkey) AS popcount
    FROM orders
    WHERE o_orderkey < 1000
    """,
    category="function",
    doc="Bitwise operator surface (&, |, ^, shifts, popcount).",
    tables=("orders",),
)

sql_query(
    "func_histogram",
    """
    SELECT CAST(FLOOR(o_totalprice / 50000) AS INT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY CAST(FLOOR(o_totalprice / 50000) AS INT)
    """,
    category="function",
    doc="Equi-width histogram via floor-division binning (WIDTH_BUCKET is not portable to DuckDB).",
    tables=("orders",),
)


# Exact-integer-syntax guard: TRY_CAST alone is NOT portable for the
# lenient path — DuckDB TRY_CAST('3.7' AS INTEGER) ROUNDS to 4 while
# Spark NULLs it, and Spark's bare 'int' typed get TRUNCATES 3.7 to 3
# and casts true to 1 (r9 advice item 3). Both sides extract the value
# as a string and admit only ^-?[0-9]+$ before the integer cast; both
# regex engines agree on this class.
_VARIANT_K_SPARK = "try_variant_get(try_parse_json(props), '$.k', 'string')"
_VARIANT_K_DUCK = "json_extract_string(TRY_CAST(props AS JSON), '$.k')"


def _variant_sql(extract: str, guard_fn: str, itype: str) -> str:
    # k computed ONCE per row in an inner projection (the VARIANT
    # parse + regex guard inside three aggregate arguments tripled the
    # per-row work — measured 0.74 -> 1.96 s at sf0.1 before this
    # hoist), then plain aggregates over k.
    return f"""
    SELECT event_type,
           COUNT(*) AS n,
           MIN(k) AS min_k,
           MAX(k) AS max_k,
           COUNT(DISTINCT k) AS distinct_k
    FROM (
      SELECT event_type,
             CASE WHEN {guard_fn} THEN CAST(s AS {itype}) END AS k
      FROM (SELECT event_type, {extract} AS s FROM events)
    )
    GROUP BY event_type
    """


sql_query(
    "func_variant_json",
    _variant_sql(_VARIANT_K_SPARK, "s RLIKE '^-?[0-9]+$'", "INT"),
    oracle=_variant_sql(
        _VARIANT_K_DUCK, "regexp_matches(s, '^-?[0-9]+$')", "INTEGER"
    ),
    category="function",
    doc=(
        "Spark 4 VARIANT path for semi-structured columns: "
        "try_parse_json into the binary VARIANT encoding once, typed "
        "try_variant_get extraction (no per-access string re-parse — "
        "the engine-native answer to schema-on-read JSON at scale, vs "
        "get_json_object's repeated parsing). LENIENT by the corpus "
        "contract: malformed JSON and non-integer values extract as "
        "NULL on both engines (round-9 fix — the FAILFAST parse_json "
        "form crashed on malformed props). Round 10 closes the "
        "remaining parity hole (r9 advice item 3): extraction is "
        "the STRING typed get guarded by an exact-integer-syntax "
        "regex before the cast, because every cast-only form "
        "diverges (Spark int get truncates 3.7 to 3 and casts "
        "true to 1; DuckDB TRY_CAST('3.7' AS INTEGER) rounds to "
        "4). Crafted-parquet differentials pin 3.7/true/quoted/"
        "non-numeric/negative on both engines."
    ),
    tables=("events",),
)


sql_query(
    "func_calendar_spine",
    """
    SELECT DATE_FORMAT(d, 'yyyy-MM-dd') AS day,
           CAST(EXTRACT(YEAR FROM d) AS BIGINT) AS year,
           CAST(EXTRACT(QUARTER FROM d) AS BIGINT) AS quarter,
           CAST(EXTRACT(MONTH FROM d) AS BIGINT) AS month,
           DATEDIFF(d, DATE'2024-01-01') % 7 AS weekday,
           DATEDIFF(d, DATE'2024-01-01') % 7 IN (5, 6) AS is_weekend
    FROM (SELECT EXPLODE(SEQUENCE(DATE'2024-01-01', DATE'2024-06-30')) AS d)
    """,
    oracle="""
    SELECT strftime(CAST(d AS DATE), '%Y-%m-%d') AS day,
           CAST(EXTRACT(YEAR FROM d) AS BIGINT) AS year,
           CAST(EXTRACT(QUARTER FROM d) AS BIGINT) AS quarter,
           CAST(EXTRACT(MONTH FROM d) AS BIGINT) AS month,
           CAST(DATEDIFF('day', DATE '2024-01-01', CAST(d AS DATE)) % 7
                AS INTEGER) AS weekday,
           DATEDIFF('day', DATE '2024-01-01', CAST(d AS DATE)) % 7 IN (5, 6)
             AS is_weekend
    FROM generate_series(DATE '2024-01-01', DATE '2024-06-30',
                         INTERVAL 1 DAY) AS t(d)
    """,
    category="function",
    doc=(
        "Calendar-spine generation: a date dimension materialized from "
        "SEQUENCE + EXPLODE (the no-source-table generator every "
        "gapfill/reporting join needs). Weekday is computed as "
        "day-offset-from-a-known-Monday mod 7 (0=Mon) — engine-"
        "portable integer arithmetic, sidestepping the engines' "
        "conflicting DAYOFWEEK origins. At scale a spine is tiny and "
        "broadcast; generate once, join everywhere."
    ),
    tables=(),
)


sql_query(
    "func_higher_order",
    """
    SELECT o_orderkey,
           SIZE(arr) AS n,
           EXISTS(arr, x -> x % 2 = 0) AS has_even,
           FORALL(arr, x -> x > 0) AS all_positive,
           SIZE(FILTER(arr, x -> x % 3 = 0)) AS n_div3,
           AGGREGATE(arr, CAST(0 AS BIGINT), (acc, x) -> acc + x) AS total
    FROM (
      SELECT o_orderkey,
             SEQUENCE(1, 1 + CAST(o_orderkey % 7 AS INT)) AS arr
      FROM orders WHERE o_orderkey < 2000
    )
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(LEN(arr) AS INTEGER) AS n,
           LEN(LIST_FILTER(arr, x -> x % 2 = 0)) > 0 AS has_even,
           LEN(LIST_FILTER(arr, x -> x <= 0)) = 0 AS all_positive,
           CAST(LEN(LIST_FILTER(arr, x -> x % 3 = 0)) AS INTEGER) AS n_div3,
           CAST(LIST_SUM(arr) AS BIGINT) AS total
    FROM (
      SELECT o_orderkey,
             RANGE(1, 2 + CAST(o_orderkey % 7 AS INT)) AS arr
      FROM orders WHERE o_orderkey < 2000
    )
    """,
    category="function",
    doc=(
        "Higher-order array lambdas: EXISTS / FORALL / FILTER / "
        "AGGREGATE (left fold with typed init) over a per-row integer "
        "array — completes the func_array family with the predicate/"
        "fold forms. Integer-only outputs keep the fold exact. Note "
        "from the shingle work: these lambdas are INTERPRETED "
        "per-element, not codegen'd — fine for small per-row arrays, "
        "but bulk text paths use the posexplode+window formulation "
        "instead (jaccard.shingle_rows)."
    ),
    tables=("orders",),
)


sql_query(
    "func_map_type",
    """
    SELECT o_orderkey, k, v,
           ELEMENT_AT(m, 'status') AS status_direct
    FROM (
      SELECT o_orderkey,
             MAP_FROM_ARRAYS(
               ARRAY('status', 'priority_len'),
               ARRAY(o_orderstatus,
                     CAST(LENGTH(o_orderpriority) AS STRING))) AS m
      FROM orders WHERE o_orderkey < 1000
    ) LATERAL VIEW EXPLODE(m) AS k, v
    """,
    oracle="""
    WITH b AS (
      SELECT o_orderkey,
             MAP(['status', 'priority_len'],
                 [o_orderstatus, CAST(LENGTH(o_orderpriority) AS VARCHAR)])
               AS m
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_orderkey,
           UNNEST(map_keys(m)) AS k,
           UNNEST(map_values(m)) AS v,
           (m['status'])[1] AS status_direct
    FROM b
    """,
    category="function",
    doc=(
        "MapType surface: construct (MAP_FROM_ARRAYS), point access "
        "(ELEMENT_AT), and EXPLODE to rows — rendered as exploded "
        "(key, value) rows because map CELLS are not hashable by the "
        "comparator (and at scale a map column consumed relationally "
        "gets exploded anyway). DuckDB's bracket access returns a "
        "LIST, hence the [1] in the oracle — a real dialect seam "
        "worth pinning."
    ),
    tables=("orders",),
)


sql_query(
    "agg_filter_clause",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE CAST(l_quantity AS DECIMAL(18,2)) > 25)
             AS n_bulk,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (WHERE CAST(l_discount AS DECIMAL(6,4)) > 0.05)
                AS DOUBLE) AS disc_rev
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="agg",
    doc=(
        "SQL-standard FILTER clause on aggregates — per-group "
        "conditional counting/summing without CASE scaffolding; plans "
        "as the same partial+final hash aggregate (the filter folds "
        "into the aggregate's update). Identical text runs on DuckDB; "
        "decimal-exact sum, double cast at the output boundary only."
    ),
    tables=("lineitem",),
)


sql_query(
    "func_try_arithmetic",
    """
    SELECT o_orderkey,
           CAST(ROUND(TRY_DIVIDE(CAST(o_totalprice AS DECIMAL(12,2)),
                                 o_orderkey % 3), 3) AS DOUBLE) AS safe_ratio,
           TRY_CAST(o_orderstatus AS INT) AS status_as_int
    FROM orders
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(CASE WHEN (o_orderkey % 3) = 0 THEN NULL
                           ELSE CAST(o_totalprice AS DECIMAL(12,2))
                                / (o_orderkey % 3) END, 3)
                AS DOUBLE) AS safe_ratio,
           TRY_CAST(o_orderstatus AS INT) AS status_as_int
    FROM orders
    """,
    category="function",
    doc=(
        "ANSI-off error-safe arithmetic (Spark's reference-parity "
        "lenient mode made explicit): TRY_DIVIDE null-safes the "
        "divide-by-zero rows, TRY_CAST yields NULL instead of raising "
        "on a non-numeric status. Oracle mirrors TRY_DIVIDE with a "
        "guarded CASE (DuckDB has TRY_CAST but no try_divide); the "
        "quotient is ROUND(...,3)'d before the double cast so both "
        "engines convert an identical small-scaled integer (the "
        "decimal→double double-rounding guard from q1)."
    ),
    tables=("orders",),
    widen=("orders",),  # 150k decimal TRY_DIVIDEs ran as ONE scan task
)


sql_query(
    "set_except_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 200000
    """,
    category="setop",
    doc=(
        "EXCEPT ALL (multiset difference): duplicates survive by "
        "multiplicity arithmetic, unlike the distinct EXCEPT — the "
        "semantics Spark plans as a left anti-ish aggregate on counts. "
        "Identical text runs on DuckDB."
    ),
    tables=("orders",),
)


sql_query(
    "set_intersect_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 100000
    """,
    category="setop",
    doc=(
        "INTERSECT ALL (multiset intersection, min-multiplicity "
        "semantics). Identical text runs on DuckDB."
    ),
    tables=("orders",),
)


sql_query(
    "agg_listagg_sorted",
    """
    SELECT r.r_name,
           LISTAGG(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
             AS nations_csv
    FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
    oracle="""
    SELECT r.r_name,
           STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations_csv
    FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
    category="agg",
    doc=(
        "Ordered string aggregation — Spark 4's SQL-standard "
        "LISTAGG ... WITHIN GROUP; DuckDB's spelling is "
        "STRING_AGG(x, sep ORDER BY x). The WITHIN GROUP ordering is "
        "what makes concatenation deterministic under parallel "
        "aggregation (an unordered collect would hash-differ per "
        "partitioning)."
    ),
    tables=("nation", "region"),
)


sql_query(
    "agg_group_by_all",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY ALL
    """,
    category="agg",
    doc=(
        "GROUP BY ALL (infer grouping keys from the non-aggregate "
        "select list) — supported by both Spark 4 and DuckDB with "
        "identical semantics; plans as the ordinary partial+final "
        "hash aggregate."
    ),
    tables=("lineitem",),
)


def _null_safe_join_sql(op_a: str) -> str:
    # NULLIF plants real NULL keys (priority bucket 5 → NULL) so the
    # null-safe operator has NULL=NULL work to do: null-bucket rows
    # must MATCH each other, which a plain equi-join silently drops
    return f"""
WITH o AS (
  SELECT o_orderkey, o_orderstatus,
         NULLIF(SUBSTRING(o_orderpriority, 1, 1), '5') AS prio_bucket
  FROM orders WHERE o_orderkey <= 300
)
SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b,
       a.prio_bucket
FROM o a JOIN o b
  ON (a.prio_bucket {op_a} b.prio_bucket)
 AND a.o_orderkey < b.o_orderkey
 AND a.o_orderstatus = b.o_orderstatus
"""


sql_query(
    "join_null_safe",
    _null_safe_join_sql("<=>"),
    oracle=_null_safe_join_sql("IS NOT DISTINCT FROM"),
    category="join",
    doc=(
        "Null-safe equi-join: Spark's `<=>` ≡ standard IS NOT "
        "DISTINCT FROM (DuckDB spelling) — NULL keys match EACH OTHER "
        "instead of being dropped, the semantics entity-resolution "
        "joins on optional attributes need (a plain = join silently "
        "loses every null-bucket pair). NULLIF plants real NULL keys "
        "so both branches execute. Spark still plans this as a hash "
        "join (null-safe equality is a valid equi-key), not a "
        "nested-loop."
    ),
    tables=("orders",),
)


sql_query(
    "agg_mode_deterministic",
    """
    SELECT l_returnflag,
           MAX_BY(qty, cnt * 1000 + qty) AS mode_qty,
           MAX(cnt) AS mode_count
    FROM (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ) t
    GROUP BY l_returnflag
    """,
    category="agg",
    doc=(
        "Deterministic MODE: native mode() breaks frequency ties "
        "arbitrarily (engine- and partitioning-dependent), so the "
        "portable form is argmax over the composite (count, value) "
        "order, encoded as the single integer cnt*1000+qty "
        "(order-isomorphic while qty < 1000 — l_quantity <= 50) so "
        "MAX_BY takes one sortable argument on both engines and the "
        "text is identical. Ties go to the LARGEST value; map-side "
        "combinable two-level aggregate."
    ),
    tables=("lineitem",),
)


# --------------------------------------------------------------------------
# URL parsing. Spark's parse_url() has no DuckDB twin, so both sides
# run the SAME regexp decomposition (RE2-safe: no backslashes, no
# lookaround — character classes only, e.g. [.] for a literal dot),
# which also keeps the text identical. The URLs are synthesized from
# document attributes — the crawl-pipeline shape where a landing URL
# is split into host / path / query parameters for per-domain caps
# and source attribution.
# --------------------------------------------------------------------------

_URL_PARSE_SQL = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/'
           || CAST(doc_id AS STRING) || '?lang=' || lang
           || '&v=' || CAST(doc_id % 7 AS STRING) AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^([a-z0-9+]+)://', 1) AS scheme,
       regexp_extract(url, '^[a-z0-9+]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z0-9+]+://[^/?#]+([/][^?#]*)', 1)
         AS url_path,
       regexp_extract(url, '^[a-z0-9+]+://([^/?#.]+)[.]', 1)
         AS subdomain,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
       regexp_extract(url, '[?&]v=([^&]*)', 1) AS v_param
FROM u
"""

sql_query(
    "func_url_parse",
    _URL_PARSE_SQL,
    category="function",
    doc=(
        "URL decomposition (scheme/host/path/subdomain/query params) "
        "via a shared RE2-safe regexp set — Spark parse_url() "
        "semantics without the dialect divergence. Pure projection: "
        "narrow scan, zero shuffles, whole-stage codegen."
    ),
    tables=("documents",),
)
