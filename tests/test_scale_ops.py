"""Skew/scale operators: salted results must equal their plain
equivalents, and bucketed joins must actually eliminate the shuffle
(asserted on the physical plan, not assumed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_spark.ops import bucketed_table, hot_keys, salted_agg, salted_join
from aws_etl_spark.plans import plan_facts
from aws_etl_spark.queries.registry import load_table


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count("*").alias("n"),
        F.max("l_discount").alias("max_disc"),
    )
    salted = salted_agg(
        li.withColumn("l_quantity", F.col("l_quantity").cast("decimal(18,2)")),
        ["l_returnflag"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "n": ("l_quantity", "count"),
            "max_disc": ("l_discount", "max"),
        },
        n_salts=8,
    )
    assert _sorted_rows(plain) == _sorted_rows(salted)


def test_salted_agg_rejects_avg(spark):
    df = spark.range(10)
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(df, ["id"], {"a": ("id", "avg")})


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    salted = salted_join(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey", n_salts=4,
    )
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _sorted_rows(plain.select(sorted(plain.columns))) == _sorted_rows(
        salted.select(sorted(salted.columns))
    )


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    small = spark.createDataFrame([(1, "x")], ["k", "w"])
    out = salted_join(big, small, "k", n_salts=4, how="left")
    rows = {tuple(r) for r in out.collect()}
    assert rows == {(1, "a", "x"), (2, "b", None)}


def test_hot_keys(spark):
    df = spark.createDataFrame(
        [(1,)] * 50 + [(2,)] * 3, ["k"]
    )
    hot = hot_keys(df, ["k"], min_count=10).collect()
    assert [(r.k, r.n_rows) for r in hot] == [(1, 50)]


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Both sides bucketed by the join key → SortMergeJoin with zero
    Exchange nodes in the plan."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bucketed_table(orders, "b_orders", "o_orderkey", n_buckets=8)
    bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", n_buckets=8,
    )
    try:
        a = spark.table("b_orders")
        b = spark.table("b_lineitem")
        joined = a.join(b, "o_orderkey")
        facts = plan_facts(joined)
        assert facts.n_exchanges == 0, (
            f"bucketed join still shuffles: {facts}"
        )
        # and the result is right
        plain = orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_range_overlap_join_matches_naive(spark):
    from aws_etl_spark.ops import range_overlap_join

    rows = [(1, 0, 10), (2, 5, 15), (3, 20, 30), (4, 10, 20), (5, 9, 21)]
    df = spark.createDataFrame(rows, ["id", "s", "e"])
    binned = range_overlap_join(
        df, df, ("id", "s", "e"), ("id", "s", "e"), bin_width=7
    ).filter(F.col("l_id") < F.col("r_id"))
    got = {(r.l_id, r.r_id) for r in binned.collect()}
    naive = {
        (a[0], b[0])
        for a in rows for b in rows
        if a[0] < b[0] and a[1] < b[2] and b[1] < a[2]
    }
    # strict overlap: (1,4) touch at 10 and must NOT match; (3,4) touch at 20
    assert (1, 4) not in got and (3, 4) not in got
    assert got == naive
    # and the plan is an equi-join on the bin, not a cartesian
    from aws_etl_spark.plans import plan_facts

    assert "CartesianProduct" not in plan_facts(binned).join_strategies


def test_bounded_rows_df_slice_scaling(spark):
    """bounded_rows_df (round-13) must keep small driver lists to ONE
    slice (no 32-task Python fan-out), scale slices with row count,
    and return the same rows as a plain createDataFrame."""
    from aws_etl_spark.ops.scale import bounded_rows_df

    small = [(i, i * 2) for i in range(100)]
    df = bounded_rows_df(spark, small, "a bigint, b bigint")
    assert df.rdd.getNumPartitions() == 1
    assert sorted(tuple(r) for r in df.collect()) == sorted(small)

    # slices grow with rows (rows_per_slice dial), capped
    df2 = bounded_rows_df(
        spark, [(i,) for i in range(1000)], "a bigint", rows_per_slice=100
    )
    assert df2.rdd.getNumPartitions() == 10
    assert df2.count() == 1000

    empty = bounded_rows_df(spark, [], "a bigint, b bigint")
    assert empty.count() == 0 and empty.columns == ["a", "b"]
