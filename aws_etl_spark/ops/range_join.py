"""Interval (range-overlap) join with bin bucketing — SURVEY §2.4's
"range" gap, built the way engines with native range-join optimization
execute it rather than as a quadratic theta join.

Naive form: ``a JOIN b ON a.start < b.end AND b.start < a.end`` — a
BroadcastNestedLoopJoin / cartesian filter, O(|a|·|b|); unusable at
scale. Binned form:

1. choose a bin width W (≈ the typical interval length);
2. explode each interval into the bins it touches
   (floor(start/W) … floor(end/W)) — expansion factor is
   len/W + 1, bounded when W matches the data;
3. equi-join on the bin id (hash shuffle, linear), verify the exact
   overlap predicate, and de-duplicate pairs that met in several bins
   (dropDuplicates on the pair key).

Cost: one hash-partitioned shuffle on bin id vs a full cross product.
Skew note: intervals much longer than W explode into many bins —
cap/clamp upstream or raise W; AQE's skew-join split handles hot bins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bins(start: Column, end: Column, width: int) -> Column:
    return F.sequence(
        F.floor(start / width).cast("long"), F.floor(end / width).cast("long")
    )


def range_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: tuple[str, str, str],
    right_keys: tuple[str, str, str],
    bin_width: int,
    how_strict: bool = True,
) -> DataFrame:
    """Pairs (left_id, right_id) whose [start, end] intervals overlap.

    ``left_keys`` / ``right_keys`` = (id, start, end) column names.
    ``how_strict``: True → open-interval overlap (a.start < b.end AND
    b.start < a.end); False → closed (≤).
    """
    lid, lstart, lend = left_keys
    rid, rstart, rend = right_keys
    l = left.select(
        F.col(lid).alias("l_id"),
        F.col(lstart).alias("l_start"),
        F.col(lend).alias("l_end"),
        F.explode(_bins(F.col(lstart), F.col(lend), bin_width)).alias("bin"),
    )
    r = right.select(
        F.col(rid).alias("r_id"),
        F.col(rstart).alias("r_start"),
        F.col(rend).alias("r_end"),
        F.explode(_bins(F.col(rstart), F.col(rend), bin_width)).alias("bin"),
    )
    lt = (lambda a, b: a < b) if how_strict else (lambda a, b: a <= b)
    overlap = lt(F.col("l_start"), F.col("r_end")) & lt(
        F.col("r_start"), F.col("l_end")
    )
    return (
        l.join(r, "bin")
        .filter(overlap)
        .select("l_id", "r_id", "l_start", "l_end", "r_start", "r_end")
        .dropDuplicates(["l_id", "r_id"])
    )
