"""Data profiling and quality gates.

The reference's entire data-quality surface is ``count(*)`` run twice
(Athena `etl_aws_vini.py:244-249`, Postgres `:251-256`) and compared by
a human reading logs. Generalized here:

- :func:`profile` — per-column stats (rows, nulls, distinct, min, max)
  in ONE pass over the data (all aggregates partial+final, map-side
  combined; no per-column scans). The ANALYZE TABLE shape, as a query.
- :func:`expect` gates — declarative post-write checks (row counts,
  null bounds, uniqueness, referential containment) that raise
  ``QualityError`` for the pipeline runner's retry/alert path.

Scale: every gate is a single aggregate or anti-join — nothing
collects raw rows to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QualityError(AssertionError):
    """A declarative data-quality expectation failed."""


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    column, one pass. ``approx_distinct`` switches exact
    count_distinct (a per-column shuffle of distinct values) to
    HyperLogLog sketches — the 100 TB default.
    """
    cols = list(columns) if columns is not None else df.columns
    distinct_fn = (
        (lambda c: F.approx_count_distinct(c, rsd=0.02))
        if approx_distinct
        else F.count_distinct
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct_fn(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    # wide → long without a second scan: one row, p struct columns,
    # inline explode
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(structs).alias("s")).select("s.*")


def expect_row_count(df: DataFrame, min_rows: int = 1, max_rows: int | None = None) -> int:
    n = df.count()
    if n < min_rows or (max_rows is not None and n > max_rows):
        raise QualityError(
            f"row count {n} outside [{min_rows}, {max_rows if max_rows is not None else '∞'}]"
        )
    return n


def expect_no_nulls(df: DataFrame, columns: Sequence[str]) -> None:
    conds = [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in columns]
    row = df.agg(*conds).first()
    bad = {c: row[c] for c in columns if row[c]}
    if bad:
        raise QualityError(f"null values present: {bad}")


def expect_unique(df: DataFrame, keys: Sequence[str]) -> None:
    dupes = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .count()
    )
    if dupes:
        raise QualityError(f"duplicate keys on {list(keys)}")


def expect_contained(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> None:
    """Referential-integrity gate: every child key exists in parent
    (anti-join; broadcast when the parent is small)."""
    orphans = (
        child.select(F.col(child_key).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .join(
            parent.select(F.col(parent_key).alias("__k")).distinct(),
            "__k",
            "left_anti",
        )
        .limit(1)
        .count()
    )
    if orphans:
        raise QualityError(f"{child_key} values missing from {parent_key}")


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Key-level reconciliation between two snapshots of a table:
    one row per key with status ``added`` (right only), ``removed``
    (left only), ``changed`` (both, any compared column differs,
    null-safe), or ``same``.

    The cross-store validation the reference does by COUNT alone
    (etl_aws_vini.py:566-585 Athena-vs-Postgres) — upgraded to
    key+value level. One full outer join on the key (single shuffle
    each side); comparison is null-safe <=> so NULL→value transitions
    count as changes.
    """
    from pyspark.sql import functions as F

    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]
    # presence flags come from sentinel columns, not value nullness —
    # a key present with all-NULL values is not "added"
    l = left.select(*keys, F.lit(True).alias("__in_l"),
                    *[F.col(c).alias(f"__l_{c}") for c in compare_cols])
    r = right.select(*keys, F.lit(True).alias("__in_r"),
                     *[F.col(c).alias(f"__r_{c}") for c in compare_cols])
    j = l.join(r, list(keys), "full_outer")
    any_diff = F.lit(False)
    for c in compare_cols:
        any_diff = any_diff | ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
    status = (
        F.when(F.col("__in_l").isNull(), F.lit("added"))
        .when(F.col("__in_r").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return j.select(*keys, status.alias("status"))
