"""SQL spelling of ``ops.keys.declared_single_partition``.

The monitor queries (KS / equi-depth PSI / CUSUM) run tiny prefix-sum
windows over bounded spines — bucket ids (≤ value_range/50 rows) or
calendar days (≤ 31 rows). Those windows are single-partition BY
CONSTRUCTION, but a bare ``OVER (ORDER BY …)`` makes WindowExec warn
"No Partition Defined" on every executed plan, flooding the bench
output capture and hiding any REAL accidental global window.

The DataFrame-side fix (``ops/keys.py``) is ``repartition(1)`` plus a
materialized ``spark_partition_id()`` partition key — ``lit(1)`` gets
folded out of the window spec by FoldablePropagation and the warning
returns. These helpers are the same seam for SQL-string queries:

* Spark: wrap the bounded relation in a ``REPARTITION(1)`` hint
  subquery, then materialize ``spark_partition_id() AS __g`` ABOVE it
  (the projection sits above the exchange, so ``__g`` is the constant
  post-repartition id — 0 — for every row). Non-deterministic, so no
  optimizer rule can fold it out of ``PARTITION BY __g``.
* DuckDB: ``0 AS __g`` — DuckDB has no such warning; the constant
  keeps the window text identical so both engines compute the same
  frames.

Callers must guarantee the wrapped relation is bounded, exactly as
with the DataFrame seam.
"""

from __future__ import annotations


def spark_declared(relation: str) -> str:
    """Spark FROM-clause wrapper: declared single-partition spine."""
    return (
        "(SELECT *, spark_partition_id() AS __g FROM "
        f"(SELECT /*+ REPARTITION(1) */ * FROM {relation}))"
    )


def duck_declared(relation: str) -> str:
    """DuckDB twin: constant partition key, same window frames."""
    return f"(SELECT *, 0 AS __g FROM {relation})"
