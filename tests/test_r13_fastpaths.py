"""Round-13 bounded-state driver fast paths: forced-path equivalence.

Two iterative operators gained a driver fast path this round (the
bounded-collect pattern): ``pagerank_quantized`` below the
``SPARK_GRAFT_PAGERANK_DRIVER_EDGES`` edge dial and
``events_markov_stationary`` below ``SPARK_GRAFT_MARKOV_DRIVER_STATES``.
Both paths are exact integer arithmetic, so the outputs must be
BIT-IDENTICAL, not merely close. These tests force each path via the
dial (0 disables the fast path) and compare full row sets.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _pairs(spark):
    # a small multi-component graph with asymmetric degrees so ranks
    # actually differ per node (two triangles bridged + a pendant)
    rows = [
        (1, 2), (2, 3), (1, 3),
        (3, 4),
        (4, 5), (5, 6), (4, 6),
        (6, 7),
    ]
    return spark.createDataFrame(rows, "id_a bigint, id_b bigint")


def test_pagerank_quantized_driver_matches_distributed(spark, monkeypatch):
    from aws_etl_spark.dedup.pagerank import pagerank_quantized

    pairs = _pairs(spark)
    monkeypatch.delenv("SPARK_GRAFT_PAGERANK_DRIVER_EDGES", raising=False)
    fast = {tuple(r) for r in pagerank_quantized(pairs).collect()}
    monkeypatch.setenv("SPARK_GRAFT_PAGERANK_DRIVER_EDGES", "0")
    slow = {tuple(r) for r in pagerank_quantized(pairs).collect()}
    assert fast == slow
    assert len(fast) == 7  # every node present exactly once


def test_pagerank_quantized_dial_boundary(spark, monkeypatch):
    """cap == edge count keeps the fast path; cap == edges-1 forces
    the distributed loop (the gate is <=)."""
    from aws_etl_spark.dedup.pagerank import pagerank_quantized

    pairs = _pairs(spark)
    # 8 undirected pairs -> 16 symmetrized edges
    monkeypatch.setenv("SPARK_GRAFT_PAGERANK_DRIVER_EDGES", "16")
    at_cap = {tuple(r) for r in pagerank_quantized(pairs).collect()}
    monkeypatch.setenv("SPARK_GRAFT_PAGERANK_DRIVER_EDGES", "15")
    above = {tuple(r) for r in pagerank_quantized(pairs).collect()}
    assert at_cap == above


@pytest.mark.parametrize(
    "name",
    [
        "dedup_containment",
        "dedup_ngram_jaccard",
        "dedup_incremental_index",
        "dedup_span_census",
        "dedup_span_doc_profile",
    ],
)
def test_shared_shingle_artifacts_match_uncached(spark, monkeypatch, name):
    """The pair-cache-served shingle/raw-pair/span-occurrence artifacts
    (round-13 sharing) must be row-identical to each query's historical
    uncached pipeline."""
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    fn = REGISTRY[name].fn
    monkeypatch.delenv("SPARK_GRAFT_NO_PAIR_CACHE", raising=False)
    cached = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}
    monkeypatch.setenv("SPARK_GRAFT_NO_PAIR_CACHE", "1")
    uncached = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}
    assert cached == uncached and cached


def test_markov_stationary_driver_matches_distributed(spark, monkeypatch):
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    fn = REGISTRY["events_markov_stationary"].fn
    monkeypatch.delenv("SPARK_GRAFT_MARKOV_DRIVER_STATES", raising=False)
    fast = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}
    monkeypatch.setenv("SPARK_GRAFT_MARKOV_DRIVER_STATES", "0")
    slow = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}
    assert fast and fast == slow


def test_para_token_substituted_and_oracle_free(spark):
    """``{PARA}`` (round-13 widen token for staged SQL) must be
    replaced with the session parallelism in the executed Spark text —
    and must never appear in any oracle text, where no engine would
    substitute it."""
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    # every oracle text is {PARA}-free
    assert not any(
        spec.oracle and "{PARA}" in spec.oracle
        for spec in REGISTRY.values()
    )
    # the one user so far: spearman's widened moment block analyzes
    # cleanly (an unsubstituted token would be a parse error) and its
    # plan carries the explicit round-robin exchange
    df = REGISTRY["stat_spearman_corr"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Repartition" in plan


def test_kcore_driver_matches_distributed(spark, monkeypatch):
    from aws_etl_spark.dedup.graph_metrics import k_core_membership

    pairs = _pairs(spark)
    monkeypatch.delenv("SPARK_GRAFT_KCORE_DRIVER_EDGES", raising=False)
    fast = {tuple(r) for r in k_core_membership(pairs).collect()}
    monkeypatch.setenv("SPARK_GRAFT_KCORE_DRIVER_EDGES", "0")
    slow = {tuple(r) for r in k_core_membership(pairs).collect()}
    assert fast == slow
    assert len(fast) == 7  # every node of the fixture graph labeled


def test_kcenter_driver_matches_distributed(spark, monkeypatch):
    from aws_etl_spark.similarity.kcenter import kcenter_greedy_quantized

    emb = spark.createDataFrame(
        [(i, [float(i % 3) * 0.25, float(i % 5) * 0.5, float(i)])
         for i in range(1, 12)],
        "vec_id bigint, embedding array<double>",
    )
    monkeypatch.delenv("SPARK_GRAFT_KCENTER_DRIVER_CELLS", raising=False)
    fast = [tuple(r) for r in kcenter_greedy_quantized(emb, k=4).collect()]
    monkeypatch.setenv("SPARK_GRAFT_KCENTER_DRIVER_CELLS", "0")
    slow = [tuple(r) for r in kcenter_greedy_quantized(emb, k=4).collect()]
    assert sorted(fast) == sorted(slow)
    assert len(fast) == 4


def test_kmeans_driver_matches_distributed(spark, monkeypatch):
    from aws_etl_spark.similarity.kmeans import kmeans_quantized

    emb = spark.createDataFrame(
        [(i, [float(i % 4) * 0.5, float(i % 7) * 0.25, float(i) * 0.125])
         for i in range(1, 21)],
        "vec_id bigint, embedding array<double>",
    )
    monkeypatch.delenv("SPARK_GRAFT_KMEANS_DRIVER_CELLS", raising=False)
    fast = {tuple(r) for r in kmeans_quantized(emb, k=4, n_iter=3).collect()}
    monkeypatch.setenv("SPARK_GRAFT_KMEANS_DRIVER_CELLS", "0")
    slow = {tuple(r) for r in kmeans_quantized(emb, k=4, n_iter=3).collect()}
    assert fast == slow
    assert len(fast) == 20


def test_canonical_distance_driver_matches_distributed(spark, monkeypatch):
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    fn = REGISTRY["dedup_canonical_distance"].fn
    monkeypatch.delenv("SPARK_GRAFT_CANON_DRIVER_EDGES", raising=False)
    fast = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}
    monkeypatch.setenv("SPARK_GRAFT_CANON_DRIVER_EDGES", "0")
    slow = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}
    assert fast and fast == slow


def test_lpa_driver_matches_distributed(spark, monkeypatch):
    from aws_etl_spark.dedup.graph_metrics import label_propagation

    pairs = _pairs(spark)
    monkeypatch.delenv("SPARK_GRAFT_LPA_DRIVER_EDGES", raising=False)
    fast = {tuple(r) for r in label_propagation(pairs).collect()}
    monkeypatch.setenv("SPARK_GRAFT_LPA_DRIVER_EDGES", "0")
    slow = {tuple(r) for r in label_propagation(pairs).collect()}
    assert fast == slow
    assert len(fast) == 7


def test_float_pagerank_driver_within_contract(spark, monkeypatch):
    """The float-variant driver replay must agree with the distributed
    loop to the query's declared tolerance (1e-6 relative — the same
    pin test_pagerank_matches_exact_power_iteration enforces; exact
    bit-equality is NOT part of this rows-only query's contract, the
    distributed float sums being partition-order dependent)."""
    from aws_etl_spark.dedup.pagerank import pagerank

    pairs = _pairs(spark)
    monkeypatch.delenv("SPARK_GRAFT_PAGERANK_DRIVER_EDGES", raising=False)
    fast = {r["node"]: (r["rank"], r["degree"]) for r in pagerank(pairs).collect()}
    monkeypatch.setenv("SPARK_GRAFT_PAGERANK_DRIVER_EDGES", "0")
    slow = {r["node"]: (r["rank"], r["degree"]) for r in pagerank(pairs).collect()}
    assert set(fast) == set(slow) and len(fast) == 7
    for n in fast:
        assert fast[n][1] == slow[n][1]
        assert abs(fast[n][0] - slow[n][0]) <= 1e-9 + 1e-6 * abs(slow[n][0])
