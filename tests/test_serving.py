"""Serving-layer queries: multi-sink reconcile + broadcast plan audit.

The reconcile's match flags must be genuine runtime comparisons over
readback data (a dropped JDBC batch flips them), and the audit's
strategy census must be scale-factor-invariant — that invariance is
what licenses its literal SQL oracle.
"""

from __future__ import annotations

from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


def test_serve_reconcile_both_sinks_match(spark, sf_dir):
    rows = {r["sink"]: r for r in
            REGISTRY["serve_reconcile"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"parquet", "derby_jdbc"}
    expected_n = rows["parquet"]["expected_rows"]
    assert expected_n > 0
    for r in rows.values():
        assert r["reconciled_rows"] == expected_n
        assert r["rows_match"] == 1 and r["total_match"] == 1
        assert r["reconciled_total"] == r["expected_total"] > 0


def test_serve_reconcile_serving_sink_is_aggregated(spark, sf_dir):
    """The Derby sink carries the per-(region, status) aggregate (the
    set-based serving shape), not the row-wise curated table."""
    from aws_etl_spark.io.readers import read_jdbc
    from aws_etl_spark.queries.serving import _serving_base

    REGISTRY["serve_reconcile"].fn(spark, sf_dir).collect()
    url = f"jdbc:derby:{_serving_base(sf_dir) / 'servedb'};create=true"
    summary = read_jdbc(spark, url, "curated_summary")
    n = summary.count()
    # bounded by |region ∪ NULL| × |order_status|, far below row count
    assert 0 < n <= 6 * 4
    assert set(c.lower() for c in summary.columns) == {
        "region_name", "order_status", "order_cnt", "price_sum"
    }


def test_serve_reconcile_flags_are_computed_not_literal(spark, sf_dir):
    """Tamper with the lake sink after the write and re-derive the
    readback comparison: the reconcile's flag logic must flip. (Runs
    the same select the query builds, over a truncated lake copy.)"""
    from pyspark.sql import functions as F

    from aws_etl_spark.queries.serving import _serving_base

    REGISTRY["serve_reconcile"].fn(spark, sf_dir).collect()
    lake = str(_serving_base(sf_dir) / "curated_parquet")
    full = spark.read.parquet(lake)
    expected_n = full.count()
    tampered = (
        full.limit(expected_n - 1)
        .agg(F.count("*").alias("reconciled_rows"))
        .select(
            F.when(F.col("reconciled_rows") == F.lit(expected_n), 1)
            .otherwise(0)
            .alias("rows_match")
        )
    )
    assert tampered.collect()[0]["rows_match"] == 0


def test_broadcast_audit_counts_are_sf_invariant(spark):
    """The literal oracle is only sound if the census does not depend
    on file-size statistics — plan at two sf dirs and compare."""
    small = REGISTRY["plan_broadcast_audit"].fn(spark, SF_SMALL).collect()
    mid = REGISTRY["plan_broadcast_audit"].fn(spark, SF_MID).collect()
    assert sorted(map(tuple, small)) == sorted(map(tuple, mid))


def test_broadcast_audit_restores_session_conf(spark, sf_dir):
    key = "spark.sql.autoBroadcastJoinThreshold"
    before = spark.conf.get(key)
    REGISTRY["plan_broadcast_audit"].fn(spark, sf_dir).collect()
    assert spark.conf.get(key) == before


def test_broadcast_audit_hinted_vs_unhinted_shape(spark, sf_dir):
    rows = {r["mode"]: r for r in
            REGISTRY["plan_broadcast_audit"].fn(spark, sf_dir).collect()}
    h, n = rows["hinted"], rows["no_hints"]
    assert h["broadcast_hash_joins"] == 4 and h["shuffle_exchanges"] == 0
    assert n["sort_merge_joins"] == 4 and n["broadcast_exchanges"] == 0
    # both sides of all 4 unhinted joins shuffle
    assert n["shuffle_exchanges"] == 8
