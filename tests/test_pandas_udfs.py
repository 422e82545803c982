"""Pandas-UDF surface: float UDAFs vs builtins (tolerance), grouped-map
vs window formulation (exact), mapInPandas pass-through filter."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_etl_spark.functions.pandas_udfs import (
    batch_normalize,
    group_topk,
    map_in_pandas_filter,
    weighted_mean_udaf,
)
from aws_etl_spark.queries.registry import load_table


def test_weighted_mean_matches_builtin(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(5000)
    got = {
        r.l_returnflag: r.wm
        for r in li.groupBy("l_returnflag")
        .agg(weighted_mean_udaf(F.col("l_extendedprice"), F.col("l_quantity")).alias("wm"))
        .collect()
    }
    exp = {
        r.l_returnflag: r.wm
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity")
            ).alias("wm")
        )
        .collect()
    }
    assert got.keys() == exp.keys()
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-9 * abs(exp[k])


def test_group_topk_equals_window(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    gm = group_topk(cust, ["c_mktsegment"], "c_acctbal", 3, "c_custkey")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    win = (
        cust.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
    )
    assert sorted(map(tuple, gm.collect())) == sorted(map(tuple, win.collect()))


def test_batch_normalize_shape(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").limit(1000)
    z = batch_normalize(cust, ["c_mktsegment"], "c_acctbal")
    stats = z.groupBy("c_mktsegment").agg(
        F.avg("zscore").alias("mu"), F.stddev_pop("zscore").alias("sd"),
        F.count("*").alias("n"),
    )
    for r in stats.collect():
        assert abs(r.mu) < 1e-8
        if r.n > 1:
            assert abs(r.sd - 1.0) < 1e-6


def test_map_in_pandas_filter(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = map_in_pandas_filter(orders, lambda pdf: pdf["o_totalprice"] > 100000)
    exp = orders.filter(F.col("o_totalprice") > 100000)
    assert got.count() == exp.count()
    assert sorted(got.columns) == sorted(exp.columns)
