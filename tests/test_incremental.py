"""Upsert/rollup operator edge cases (the happy paths are
oracle-checked via merge_upsert / events_rollup_daily)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_spark.ops import rollup_partials, upsert


def test_upsert_schema_mismatch_rejected(spark):
    t = spark.createDataFrame([(1, "a")], ["k", "v"])
    u = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert(t, u, ["k"])


def test_upsert_composite_key(spark):
    t = spark.createDataFrame([(1, 1, "old"), (1, 2, "keep")], ["a", "b", "v"])
    u = spark.createDataFrame([(1, 1, "new"), (2, 2, "ins")], ["a", "b", "v"])
    out = {(r.a, r.b): r.v for r in upsert(t, u, ["a", "b"]).collect()}
    assert out == {(1, 1): "new", (1, 2): "keep", (2, 2): "ins"}


def test_rollup_composes(spark):
    """rollup(rollup(x)) == rollup(x) at the coarser grain — partial
    counts must stay summable after the first fold."""
    rows = [("d1", "h1", "a", 2, 10), ("d1", "h2", "a", 3, 20), ("d2", "h1", "a", 1, 5)]
    hourly = spark.createDataFrame(rows, ["day", "hour", "typ", "n", "total"])
    daily = rollup_partials(hourly, ["day", "typ"], sum_cols=["total"], count_cols=["n"])
    overall = rollup_partials(daily, ["typ"], sum_cols=["total"], count_cols=["n"])
    r = overall.collect()[0]
    assert (r.typ, r.n, r.total) == ("a", 6, 35)


def test_rollup_requires_aggregates(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="no aggregate"):
        rollup_partials(df, ["k"])


def test_contiguous_ids_dense_and_unique(spark, sf_dir):
    from aws_etl_spark.ops import with_contiguous_ids
    from aws_etl_spark.queries.registry import load_table

    orders = load_table(spark, sf_dir, "orders").repartition(7)
    with_sk = with_contiguous_ids(orders)
    n = orders.count()
    ids = [r.sk for r in with_sk.select("sk").collect()]
    assert sorted(ids) == list(range(n))  # dense 0..n-1, no dupes
    assert set(with_sk.columns) == set(orders.columns) | {"sk"}


def test_sparse_ids_unique(spark, sf_dir):
    from aws_etl_spark.ops import with_sparse_ids
    from aws_etl_spark.queries.registry import load_table

    cust = load_table(spark, sf_dir, "customer").repartition(5)
    with_sk = with_sparse_ids(cust)
    assert with_sk.select("sk").distinct().count() == cust.count()
