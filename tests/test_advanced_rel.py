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


def test_approx_percentiles_within_rank_error(spark, sf_dir):
    """Sketch estimates must land within a small relative-rank window
    of the exact order statistics (accuracy=10000 ⇒ ±1e-4 rank error;
    gate at ±1% rank for slack across group sizes)."""
    _ensure_loaded()
    rows = REGISTRY["agg_approx_percentiles"].fn(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    by_flag = {
        r.l_returnflag: sorted(
            x.l_extendedprice
            for x in li.filter(F.col("l_returnflag") == r.l_returnflag)
            .select("l_extendedprice")
            .collect()
        )
        for r in rows
    }
    for r in rows:
        vals = by_flag[r.l_returnflag]
        n = len(vals)
        assert r.n == n
        for q, est in ((0.25, r.p25), (0.5, r.p50), (0.75, r.p75), (0.95, r.p95)):
            lo = vals[max(0, int((q - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((q + 0.01) * n))]
            assert lo <= est <= hi, (r.l_returnflag, q, est, lo, hi)


def test_hll_mergeable_sketches(spark, sf_dir):
    """The property that makes sketches the 100 TB distinct-count
    path: per-shard partial sketches UNION-merged give EXACTLY the
    same estimate as one single-pass sketch (merge invariance of the
    Datasketches HLL), and the estimate sits within the HLL error
    bound of the exact count."""
    from pyspark.sql import functions as F

    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded, load_table

    _ensure_loaded()
    merged = {
        r.event_type: r.est_users
        for r in REGISTRY["sketch_hll_mergeable"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    single = {
        r.event_type: int(r.est)
        for r in ev.groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged == single, "sharded union must equal single-pass sketch"
    for et, n in exact.items():
        # default lgK=12 → relative error ~1.6%; generous 5% gate
        assert abs(merged[et] - n) <= max(2, 0.05 * n), (et, merged[et], n)
