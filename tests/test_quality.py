"""Quality gates: each expectation passes on clean data and raises
QualityError with a useful message on dirty data; sampling operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_spark.ops import (
    QualityError,
    expect_contained,
    expect_no_nulls,
    expect_row_count,
    expect_unique,
    profile,
)
from aws_etl_spark.queries.registry import load_table


def test_profile_one_pass_shape(spark, sf_dir):
    from aws_etl_spark.plans import plan_facts

    orders = load_table(spark, sf_dir, "orders")
    p = profile(orders, ["o_orderkey", "o_orderstatus"])
    rows = {r.column: r for r in p.collect()}
    assert set(rows) == {"o_orderkey", "o_orderstatus"}
    n = orders.count()
    assert rows["o_orderkey"].n_rows == n
    assert rows["o_orderkey"].n_distinct == n  # primary key
    assert rows["o_orderkey"].n_nulls == 0
    assert rows["o_orderstatus"].n_distinct <= 3
    assert plan_facts(p).n_scans == 1  # ONE pass over the table


def test_profile_approx_mode(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    p = {r.column: r for r in profile(orders, ["o_custkey"], approx_distinct=True).collect()}
    exact = orders.select(F.count_distinct("o_custkey")).first()[0]
    assert abs(p["o_custkey"].n_distinct - exact) / exact < 0.1


def test_expect_row_count(spark):
    df = spark.range(5)
    assert expect_row_count(df, min_rows=5, max_rows=5) == 5
    with pytest.raises(QualityError, match="row count"):
        expect_row_count(df, min_rows=6)


def test_expect_no_nulls(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["k", "v"])
    expect_no_nulls(df, ["k"])
    with pytest.raises(QualityError, match="null values present"):
        expect_no_nulls(df, ["v"])


def test_expect_unique(spark):
    df = spark.createDataFrame([(1, 1), (1, 2)], ["a", "b"])
    expect_unique(df, ["a", "b"])
    with pytest.raises(QualityError, match="duplicate keys"):
        expect_unique(df, ["a"])


def test_expect_contained(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    expect_contained(cust, "c_nationkey", nation, "n_nationkey")
    with pytest.raises(QualityError, match="missing"):
        expect_contained(nation, "n_nationkey", cust.limit(0), "c_nationkey")


def test_sampling(spark, sf_dir):
    """df.sample: seeded determinism + fraction sanity; sampleBy:
    per-stratum fractions honored approximately."""
    orders = load_table(spark, sf_dir, "orders")
    s1 = orders.sample(fraction=0.1, seed=7)
    s2 = orders.sample(fraction=0.1, seed=7)
    assert s1.count() == s2.count()  # seeded => reproducible
    n = orders.count()
    assert 0.05 * n < s1.count() < 0.15 * n
    strat = orders.sampleBy("o_orderstatus", {"O": 0.5, "F": 0.05}, seed=7)
    got = {r.o_orderstatus: r.n for r in strat.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    base = {r.o_orderstatus: r.n for r in orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    assert 0.3 < got.get("O", 0) / base["O"] < 0.7
    assert got.get("P", 0) == 0  # stratum not in fractions => dropped


def test_table_diff_statuses_by_construction(spark):
    from aws_etl_spark.ops.quality import table_diff

    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "d", None)],
        ["k", "s", "v"],
    )
    right = spark.createDataFrame(
        # 1 unchanged; 2 value change; 3 NULL→value change; 4 dropped;
        # 5 added
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        ["k", "s", "v"],
    )
    got = {r.k: r.status for r in table_diff(left, right, ["k"]).collect()}
    assert got == {1: "same", 2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_shuffle_deterministic_invariant_to_partitioning(spark, sf_dir):
    """corpus_shuffle_deterministic must emit the identical
    (doc_id, shard, pos_in_shard) assignment whatever the physical
    partitioning — the whole point of the hash coin over ORDER BY
    rand(). Run the registry query under two different
    spark.sql.shuffle.partitions settings and compare exactly."""
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    fn = REGISTRY["corpus_shuffle_deterministic"].fn
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = {tuple(r) for r in fn(spark, sf_dir).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = {tuple(r) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b and len(a) > 0
