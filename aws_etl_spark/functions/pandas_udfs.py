"""The engine's Python extension surface (SURVEY.md §2.11 — Gap: the
reference imports pyspark.sql.functions and never uses it, let alone a
UDF). Three Arrow-batched shapes, each the idiomatic replacement for a
row-at-a-time Python UDF (10–100× faster; see /opt/skills guidance and
the Spark docs on vectorized UDFs):

- scalar pandas UDF     — elementwise over Arrow batches
  (production examples live in aws_etl_spark.similarity.topk:
  pair_dot, signature kernels);
- grouped-agg pandas UDF (:func:`weighted_mean_udaf`, :func:`span_udaf`)
  — one value per group, usable inside groupBy().agg() and windows;
- grouped-map applyInPandas (:func:`group_topk`) — whole-group
  pandas transform, the escape hatch for per-group logic SQL can't
  express.

Determinism: grouped-agg float folds depend on within-group row order,
so oracle-checked queries restrict them to order-independent cases
(integer-valued doubles sum exactly; max/min are order-free). General
float UDAFs are tested against Spark builtins with tolerance instead
(tests/test_pandas_udfs.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def weighted_mean_udaf(values: Column, weights: Column) -> Column:
    """Grouped-agg pandas UDF: Σ(v·w)/Σ(w) per group in one Arrow pass."""

    @F.pandas_udf("double")
    def _wm(v: pd.Series, w: pd.Series) -> float:
        denom = w.sum()
        return float((v * w).sum() / denom) if denom else float("nan")

    return _wm(values, weights)


def span_udaf(values: Column) -> Column:
    """Grouped-agg pandas UDF: max−min (order-independent, exact on
    doubles — safe for oracle comparison)."""

    @F.pandas_udf("double")
    def _span(v: pd.Series) -> float:
        return float(v.max() - v.min())

    return _span(values)


def exact_sum_udaf(values: Column) -> Column:
    """Grouped-agg pandas UDF: sum. Exact (hence order-independent and
    oracle-safe) only over integer-valued doubles below 2^53."""

    @F.pandas_udf("double")
    def _s(v: pd.Series) -> float:
        return float(v.sum())

    return _s(values)


def group_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group top-k with rank via applyInPandas (grouped-map).

    Equivalent to a ROW_NUMBER window — implemented as a pandas
    transform to exercise the grouped-map path: each group arrives as
    one pandas DataFrame, is sorted (order_col desc, tiebreak asc —
    fully deterministic), truncated to k, and returned with an int
    ``rank`` column appended.

    Scale: one shuffle on the group keys (same as the window variant);
    per-group data must fit a pandas frame — for heavy groups use the
    Window.row_number formulation instead (sort-based, spillable).
    """
    # build a FRESH StructType — StructType.add mutates in place and
    # would corrupt the source DataFrame's cached schema
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("rank", T.IntegerType())]
    )

    def _topk(pdf: pd.DataFrame) -> pd.DataFrame:
        ordered = pdf.sort_values(
            [order_col, tiebreak_col], ascending=[False, True]
        ).head(k)
        ordered = ordered.assign(rank=range(1, len(ordered) + 1))
        return ordered

    return df.groupBy(*group_cols).applyInPandas(_topk, schema=out_schema)


def batch_normalize(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score via applyInPandas — the grouped-map shape for
    per-group numerics (float result: tolerance-tested, not oracled)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        std = v.std(ddof=0)
        z = (v - v.mean()) / std if std else v * 0.0
        return pdf.assign(**{out_col: z})

    return df.groupBy(*group_cols).applyInPandas(_norm, schema=out_schema)


def map_in_pandas_filter(
    df: DataFrame, predicate, batch_cols: list[str] | None = None
) -> DataFrame:
    """mapInPandas pass-through filter: streams Arrow batches through a
    Python predicate without materializing the partition (the shape for
    row-level Python logic over 100 TB — constant memory per task)."""
    schema = df.schema

    def _f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf[predicate(pdf)]

    return df.mapInPandas(_f, schema=schema)
