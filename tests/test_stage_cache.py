"""The staged_sql_query stage cache (round 12 — closes the r12 ADVICE
advisory on duplicate spine stages): identical stage-view texts over
the same input snapshot materialize ONCE per process; a rewritten
input misses by (size, mtime_ns) fingerprint; the escape hatch
bypasses reuse entirely; results stay hash-identical either way."""

from __future__ import annotations

import os
import shutil

import pandas as pd

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import (
    REGISTRY,
    _STAGE_CACHE_STATS,
    _ensure_loaded,
)

_ensure_loaded()

SF0001 = "/root/testdata/sf0.001"

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _mk_sf(tmp_path, copy=()):
    sf = tmp_path / "sf"
    sf.mkdir(parents=True, exist_ok=True)
    for t in _TABLES:
        dst = sf / f"{t}.parquet"
        if t in copy:
            shutil.copy(f"{SF0001}/{t}.parquet", str(dst))
        else:
            os.symlink(f"{SF0001}/{t}.parquet", str(dst))
    return str(sf)


def test_shared_spine_stage_served_from_cache(spark, tmp_path):
    """The ten daily-spine consumers share ONE materialized events
    rollup per input snapshot: the second consumer's stage is a cache
    hit, and both stay hash-green."""
    sf = _mk_sf(tmp_path)
    h0, m0 = _STAGE_CACHE_STATS["hits"], _STAGE_CACHE_STATS["misses"]
    assert check_query("events_acf_daily", spark, sf).ok
    assert check_query("stat_durbin_watson", spark, sf).ok
    assert _STAGE_CACHE_STATS["misses"] == m0 + 1  # one spine text
    assert _STAGE_CACHE_STATS["hits"] == h0 + 1  # dw reused it


def test_rewritten_input_misses_by_fingerprint(spark, tmp_path):
    """Rewriting the source parquet at the same path changes the
    (size, mtime_ns) stamp: the next call re-stages instead of
    serving the stale snapshot — the contract-tightening the cache
    must never break."""
    sf = _mk_sf(tmp_path, copy=("events",))
    m0 = _STAGE_CACHE_STATS["misses"]
    assert check_query("events_acf_daily", spark, sf).ok
    assert _STAGE_CACHE_STATS["misses"] == m0 + 1
    ev = pd.read_parquet(f"{sf}/events.parquet").head(50)
    ev.to_parquet(f"{sf}/events.parquet")
    assert check_query("events_acf_daily", spark, sf).ok
    assert _STAGE_CACHE_STATS["misses"] == m0 + 2
    row = REGISTRY["events_acf_daily"].fn(spark, sf).collect()
    # the fresh stage really read the 50-row rewrite
    assert sum(r.n_pairs for r in row) < 300


def test_escape_hatch_bypasses_reuse(spark, tmp_path):
    sf = _mk_sf(tmp_path)
    os.environ["SPARK_GRAFT_NO_STAGE_CACHE"] = "1"
    try:
        h0, m0 = _STAGE_CACHE_STATS["hits"], _STAGE_CACHE_STATS["misses"]
        assert check_query("events_acf_daily", spark, sf).ok
        assert check_query("stat_durbin_watson", spark, sf).ok
        assert (_STAGE_CACHE_STATS["hits"], _STAGE_CACHE_STATS["misses"]) == (
            h0, m0,
        )
    finally:
        os.environ.pop("SPARK_GRAFT_NO_STAGE_CACHE", None)


def test_distinct_inputs_never_share(spark, tmp_path):
    """Two different sf dirs (distinct symlink targets resolve to the
    same stats, so use a real copy) never share a stage."""
    sf_a = _mk_sf(tmp_path / "a", copy=("events",))
    sf_b = _mk_sf(tmp_path / "b", copy=("events",))
    # make b genuinely different
    ev = pd.read_parquet(f"{sf_b}/events.parquet").head(70)
    ev.to_parquet(f"{sf_b}/events.parquet")
    assert check_query("events_acf_daily", spark, sf_a).ok
    assert check_query("events_acf_daily", spark, sf_b).ok
    rows_a = REGISTRY["events_acf_daily"].fn(spark, sf_a).collect()
    rows_b = REGISTRY["events_acf_daily"].fn(spark, sf_b).collect()
    assert sum(r.n_pairs for r in rows_a) != sum(r.n_pairs for r in rows_b)
