"""Round-13 pre-hardening for the block-3 rotation queue (the 25
remaining r6-vintage names): next round's window should carry no
known surprises.

Unlike the r11/r12 queues, every name in this queue ALREADY has
crafted-input differential coverage from earlier hardening passes —
the manifest test below pins exactly where, so the claim stays
checkable instead of anecdotal. The remaining tests add boundary
edges those passes did not reach: the sessionization gap boundary
(<= vs <), empty-input windows, and hour-boundary events arriving
out of order.

Fixture rule (round-11 lesson): every timestamp column in a crafted
frame is written as datetime64[us]."""

from __future__ import annotations

import pandas as pd

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
from tests.test_round12_prehardening_r6 import (
    SF0001,
    _customer,
    _events,
    _mk_sf,
    _orders,
)

_ensure_loaded()


# Each r13 block-3 queue name -> the test module(s) holding its
# crafted-input differentials. Grepped and reviewed at round-13 start;
# the test asserts the name really appears there so a refactor that
# drops coverage fails here, not in the driver window.
_QUEUE_COVERAGE = {
    "func_url_parse": ["test_round12_prehardening_r6"],
    "text_quality_score": ["test_round12_prehardening_r6"],
    "text_lang_id": ["test_family_edges"],
    "text_tf_idf": ["test_round12_prehardening_r6"],
    "text_textrank_keywords": [
        "test_gram_and_drift", "test_round12_prehardening_r6",
    ],
    "ann_cosine_topk_ivf_exact": ["test_round12_prehardening_r6"],
    "similarity_mmr_rerank": ["test_round11_prehardening"],
    "embeddings_gram_matrix": ["test_round12_prehardening_r6"],
    "embeddings_pca_power": ["test_round12_prehardening_r6"],
    "embeddings_random_projection": ["test_round12_prehardening_r6"],
    "agg_rollup": ["test_round12_prehardening_r6"],
    "agg_having": ["test_round12_prehardening_r6"],
    "set_union_all": ["test_round12_prehardening_r6"],
    "set_intersect": ["test_round12_prehardening_r6"],
    "set_except": ["test_round12_prehardening_r6"],
    "window_ranking": ["test_round12_prehardening_r6"],
    "window_running_sum": ["test_round12_prehardening_r6"],
    "window_lag_lead": ["test_round12_prehardening_r6"],
    "serve_reconcile": ["test_serving"],
    "plan_broadcast_audit": ["test_serving"],
    "events_tumbling_hourly": ["test_round12_prehardening_r6"],
    "events_sessionization": ["test_family_edges"],
    "events_gapfill_locf": ["test_round12_prehardening_r6"],
    "events_dau_mau": ["test_round12_prehardening_r6"],
    "events_seasonal_decompose": ["test_round12_prehardening_r6"],
}


def test_queue_coverage_manifest():
    import os

    here = os.path.dirname(__file__)
    for name, modules in _QUEUE_COVERAGE.items():
        assert name in REGISTRY, name
        for mod in modules:
            path = os.path.join(here, f"{mod}.py")
            with open(path) as f:
                assert f'"{name}"' in f.read(), (
                    f"{name}: crafted coverage claimed in {mod}.py but "
                    "the name no longer appears there"
                )


def test_sessionization_gap_boundary(spark, tmp_path):
    """An event EXACTLY 30 minutes after its predecessor extends the
    session (the oracle's strict >); one second past the gap starts a
    new one. Both engines must agree on the boundary."""
    rows = [
        ("b0", "2024-03-01 00:00:00", 1, "view", 1.0),
        ("b1", "2024-03-01 00:30:00", 1, "view", 1.0),  # == gap: same
        ("b2", "2024-03-01 01:00:01", 1, "view", 1.0),  # > gap: new
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("events_sessionization", spark, sf)
    assert r.ok, str(r)
    sess = sorted(
        REGISTRY["events_sessionization"].fn(spark, sf).collect(),
        key=lambda x: x.session_seq,
    )
    assert [s.n_events for s in sess] == [2, 1]


def test_windows_empty_inputs(spark, tmp_path):
    """Zero-row customer/orders tables through the three window
    queries: 0 rows on both engines, no window-frame degeneracy."""
    sf = _mk_sf(tmp_path, customer=_customer([]), orders=_orders([]))
    for name in ("window_ranking", "window_running_sum",
                 "window_lag_lead"):
        r = check_query(name, spark, sf)
        assert r.ok, f"{name}: {r}"
        assert REGISTRY[name].fn(spark, sf).count() == 0


def test_tumbling_hourly_out_of_order_arrival(spark, tmp_path):
    """Row order in the parquet must not affect window assignment:
    the same events written forward and reversed hash identically
    (the 100 TB reality — nothing arrives sorted)."""
    rows = [
        ("o0", "2024-03-01 10:59:59", 1, "view", 1.0),
        ("o1", "2024-03-01 10:00:00", 1, "view", 2.0),
        ("o2", "2024-03-01 11:00:00", 2, "click", 3.0),
        ("o3", "2024-03-01 09:30:00", 2, "view", 4.0),
    ]
    sf_f = _mk_sf(tmp_path / "f", events=_events(rows))
    sf_r = _mk_sf(tmp_path / "r", events=_events(rows[::-1]))
    assert check_query("events_tumbling_hourly", spark, sf_f).ok
    assert check_query("events_tumbling_hourly", spark, sf_r).ok
    a = sorted(map(tuple, REGISTRY["events_tumbling_hourly"].fn(spark, sf_f).collect()))
    b = sorted(map(tuple, REGISTRY["events_tumbling_hourly"].fn(spark, sf_r).collect()))
    assert a == b
