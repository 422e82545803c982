"""Incremental-maintenance operators: keyed upsert (MERGE) and rollup
of pre-aggregated partials.

The reference's only "incremental" notion is replace-everything-daily
(`mode("overwrite")` everywhere; pandas `if_exists='replace'` at
etl_aws_vini.py:334). These operators are the engine-level pieces a
real incremental pipeline needs:

- :func:`upsert` — SQL MERGE semantics (update matched keys, insert
  unmatched) as a pure DataFrame rewrite. Without a transactional
  table format this is write-side merge (read current, merge, write
  next version); on Delta/Iceberg the same call maps to MERGE INTO.
- :func:`rollup_partials` — re-aggregate pre-aggregated partial
  results to a coarser grain (hourly → daily, the
  continuous-aggregate / hypertable-rollup pattern): sums add, counts
  add, mins/maxes fold — avg must be carried as (sum, count). At
  100 TB you never re-scan raw events for the daily view; you fold
  24 hourly partials per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE: rows of ``updates`` replace same-key rows of ``target``;
    unmatched update rows are inserted; unmatched target rows survive.

    Both sides must share a schema. One shuffle on the key (the
    anti-join and the union reuse the same hash partitioning); if
    ``updates`` is small it broadcasts and the target never shuffles.
    Duplicate keys WITHIN ``updates`` are an error at merge semantics
    level — deduplicate upstream (enforced cheaply here only for the
    oracle-tested path; full enforcement would cost an extra count).
    """
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: {sorted(target.columns)} vs {sorted(updates.columns)}"
        )
    keys = list(keys)
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)


def scd2_from_history(
    history: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from a change history.

    Input: one row per observed (key, ts, attributes). Output: validity
    intervals — ``valid_from`` = the change's timestamp, ``valid_to`` =
    next change's timestamp per key (NULL = current), ``is_current``.
    Consecutive rows with identical attributes are collapsed (no
    zero-change versions).

    One shuffle on the key; interval derivation is a lead() window over
    the same partitioning. The reference's pipeline overwrites
    dimensions daily and keeps no history at all — this is the
    warehouse-grade replacement.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    # collapse no-change rows: keep a row only when any attribute
    # differs from the previous observation of the same key
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~(
            (F.col(c) == prev) | (F.col(c).isNull() & prev.isNull())
        )
    first = F.row_number().over(w) == 1
    versions = history.withColumn("__keep", first | changed).filter(
        F.col("__keep")
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    return (
        versions.select(
            *keys,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def rollup_partials(
    partials: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold pre-aggregated partials to a coarser grain.

    ``count_cols`` are *partial counts* (they add, like sums);
    column names are preserved so a rollup of a rollup composes.
    """
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.sum(c).alias(c) for c in count_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    if not aggs:
        raise ValueError("no aggregate columns given")
    return partials.groupBy(*group_cols).agg(*aggs)


def encode_dictionary(
    df: DataFrame, col: str, code_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Dictionary-encode a low-cardinality string column: returns
    (encoded df, dictionary df) where the dictionary maps
    ``code`` (dense 1..K by lexicographic value order — deterministic)
    to ``value``.

    The dictionary is built with one distinct + a tiny window over K
    rows, then broadcast back — the fact table never shuffles. The
    at-rest compression step for 100 TB string columns (int joins and
    group-bys downstream are several times cheaper than string ones).
    """
    code_col = code_col or f"{col}_code"
    # the window input is the K distinct values (bounded by contract:
    # dictionary encoding is for low-cardinality columns); the single
    # window partition is declared via ops.keys.declared_single_partition
    # so WindowExec does not warn about an undefined partition
    from aws_etl_spark.ops.keys import declared_single_partition

    dictionary = (
        declared_single_partition(
            df.select(F.col(col).alias("value"))
            .filter(F.col("value").isNotNull())
            .distinct()
        )
        .withColumn(
            "code",
            F.row_number()
            .over(Window.partitionBy("__g").orderBy("value"))
            .cast("int"),
        )
        .drop("__g")
    )
    encoded = df.join(
        F.broadcast(dictionary.withColumnRenamed("value", col)), col, "left"
    ).withColumnRenamed("code", code_col)
    return encoded, dictionary
