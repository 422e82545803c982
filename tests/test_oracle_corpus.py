"""Differential test: every registered query with an oracle must
hash-match DuckDB at the smoke scale factor — the same gate the driver
applies at sf0.01 (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

# Round-14 verify-budget split (r13 verdict item 1): this is one of
# the heavyweight gate suites excluded from the driver's default
# pytest run; builder gates run it via -m "slow or not slow".
pytestmark = pytest.mark.slow

_ensure_loaded()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir):
    result = check_query(name, spark, sf_dir)
    assert result is not None
    assert result.ok, str(result)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
