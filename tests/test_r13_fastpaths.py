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
