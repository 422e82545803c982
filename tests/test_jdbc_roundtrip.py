"""Real JDBC roundtrip (round-1 verdict item #8).

The reference serves curated data to Postgres/Redshift over JDBC
(etl_aws_vini.py:307-335 write, :364-377 read-back). No network DB
exists in this sandbox, but Spark ships embedded Derby (its Hive
metastore backend) — so the engine's JDBC write and partitioned-read
code paths run for real here: every executor thread opens its own
connection, Spark's DerbyDialect maps types, and the read-back goes
through the JDBC scan (filter pushdown included). Embedded Derby is
single-JVM; on a cluster the same code takes a network JDBC URL.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_etl_spark.io.readers import read_jdbc
from aws_etl_spark.io.writers import write_jdbc


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_then_read_roundtrip(spark, derby_url):
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
    )
    write_jdbc(df, derby_url, "t_roundtrip", mode="overwrite")

    back = read_jdbc(spark, derby_url, "t_roundtrip")
    assert back.count() == 1000
    got = {r["id"]: r for r in back.collect()}
    assert got[42]["name"] == "name_42"
    assert got[42]["grp"] == 0
    assert got[42]["score"] == 63.0


def test_jdbc_partitioned_read(spark, derby_url):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    write_jdbc(df, derby_url, "t_partitioned", mode="overwrite")

    back = read_jdbc(
        spark,
        derby_url,
        "t_partitioned",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1000,
    )
    # the partitioned pull really splits the scan: one JDBC query per
    # stride, not a single-connection driver bottleneck
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg(F.sum("id")).collect()[0][0] == 499500


def test_jdbc_filter_pushdown(spark, derby_url):
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 7).alias("grp"))
    write_jdbc(df, derby_url, "t_pushdown", mode="overwrite")

    back = read_jdbc(spark, derby_url, "t_pushdown").filter(F.col("id") < 10)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan" in plan, plan
    assert back.count() == 10


def test_jdbc_append_mode(spark, derby_url):
    df = spark.range(0, 10).select(F.col("id"))
    write_jdbc(df, derby_url, "t_append", mode="overwrite")
    write_jdbc(df, derby_url, "t_append", mode="append")
    assert read_jdbc(spark, derby_url, "t_append").count() == 20
