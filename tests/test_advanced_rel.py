"""Error-bound check for the approximate-distinct sketch (no SQL
oracle possible — HLL values are engine-specific) plus the oracle
sweep already covers the rest of advanced_rel via test_oracle_corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded, load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    _ensure_loaded()
    approx = {
        r.o_orderpriority: r.approx_customers
        for r in REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, est in approx.items():
        rel_err = abs(est - exact[k]) / exact[k]
        assert rel_err < 0.10, (k, est, exact[k])
