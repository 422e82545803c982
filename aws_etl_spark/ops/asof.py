"""As-of (time-travel) join — an operator stock Spark lacks.

Implemented as the union-sort trick, not a range cross-join: tag both
sides, union on (key, ts), and carry the most recent right-side row
forward with ``last(..., ignorenulls=True)`` over a
partition-by-key/order-by-ts window. Cost = ONE shuffle on the key +
an in-partition sort — identical shape to a sort-merge join, linear
in input size (a naive ``l.ts >= r.ts`` theta join is quadratic and
unusable at scale).

Tie semantics: a right row with ts equal to the left row's ts matches
(≤, like DuckDB/kdb asof), enforced by sorting right rows before left
rows at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_value_cols: list[str],
    right_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row
    with the greatest ``ts_col`` ≤ the left row's, per ``on`` keys.

    Right value columns appear as ``{right_prefix}{col}`` plus
    ``{right_prefix}ts``; unmatched left rows get NULLs (left outer).

    Caller contract: the right side must be unique per (on, ts) —
    otherwise the surviving match among equal timestamps is
    tie-broken arbitrarily (dedupe first if needed).
    """
    rv = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c) for c in right_value_cols]
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias("__evt_ts"),
        F.lit(0).alias("__side"),
        rv.alias("__rv"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        *[F.col(c) for c in on],
        F.col(ts_col).alias("__evt_ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__evt_ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__rv", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_cols += [F.col("__match.__ts").alias(f"{right_prefix}ts")]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in right_value_cols
    ]
    return carried.filter(F.col("__side") == 1).select(*out_cols)
