"""Registry-wide dtype convention gate (round-1 verdict, rule #4).

Every driver-checked query (one with an oracle) must hand the driver
only stable, engine-agnostic dtypes: string, integer widths, double,
timestamp, boolean. DECIMAL, DATE, FLOAT, and array/map/struct columns
hash differently between Spark and DuckDB under the driver's
canonicalizer (CORRECTNESS_r01: func_math Decimal, events_rollup int
vs HUGEINT→float, func_array list crash) — so they are banned at the
output boundary. Schema inspection is lazy (no job runs), so this
sweeps all queries cheaply.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

# Round-14 verify-budget split (r13 verdict item 1): this is one of
# the heavyweight gate suites excluded from the driver's default
# pytest run; builder gates run it via -m "slow or not slow".
pytestmark = pytest.mark.slow

_ensure_loaded()

ALLOWED = (
    T.StringType,
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.TimestampType,
    T.BooleanType,
)

_ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", _ORACLED)
def test_output_dtypes_are_driver_stable(name, spark, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if not isinstance(f.dataType, ALLOWED)
    ]
    assert not bad, (
        f"{name} emits driver-unstable output dtypes {bad}; cast to "
        "DOUBLE/BIGINT/STRING/TIMESTAMP in both dialects"
    )
