"""Edge-input differentials for OLDER query families (the round-8
`test_round8_edges.py` pattern applied backward): crafted parquet
fires guard branches the synthetic corpus never reaches — singleton
and homogeneous privacy groups, tied-timestamp sessions, the exact
30-minute gap boundary, out-of-order funnels, zero-drift halves, the
'und' language branch — and each case must still hash-match DuckDB."""

from __future__ import annotations

import os

import pandas as pd

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
SF0001 = "/root/testdata/sf0.001"


def _mk_sf(tmp_path, **frames) -> str:
    from aws_etl_spark.queries.registry import ALL_TABLES

    d = tmp_path / "sf_edge"
    d.mkdir()
    for t in ALL_TABLES:
        os.symlink(f"{SF0001}/{t}.parquet", d / f"{t}.parquet")
    for t, pdf in frames.items():
        os.remove(d / f"{t}.parquet")
        pdf.to_parquet(d / f"{t}.parquet")
    return str(d)


def _customers(rows):
    """rows: (key, nationkey, acctbal, segment)."""
    return pd.DataFrame(
        {
            "c_custkey": [r[0] for r in rows],
            "c_name": [f"Customer#{r[0]:09d}" for r in rows],
            "c_nationkey": [r[1] for r in rows],
            "c_acctbal": [float(r[2]) for r in rows],
            "c_mktsegment": [r[3] for r in rows],
        }
    )


def _events(rows):
    """rows: (event_id, iso_ts, user_id, event_type, value)."""
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [float(r[4]) for r in rows],
            "props": ["{}"] * len(rows),
        }
    )


def _docs(texts):
    return pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )


# -- privacy ladder ----------------------------------------------------------


def test_k_anonymity_every_group_singleton_cross_engine(spark, tmp_path):
    """Every QI tuple unique -> the whole population lands in the k=1
    (re-identifiable) bucket on both engines."""
    sf = _mk_sf(
        tmp_path,
        customer=_customers(
            [(i, i, 1000.0 * i + 1, "BUILDING") for i in range(1, 7)]
        ),
    )
    r = check_query("privacy_k_anonymity", spark, sf)
    assert r.ok, str(r)
    rows = {
        x.k_bucket: x
        for x in REGISTRY["privacy_k_anonymity"].fn(spark, sf).collect()
    }
    (only,) = rows.values()
    assert only.n_rows == 6


def test_k_anonymity_one_giant_group_cross_engine(spark, tmp_path):
    """All rows share one QI tuple -> a single 10+ group, zero
    re-identifiable rows."""
    sf = _mk_sf(
        tmp_path,
        customer=_customers(
            [(i, 3, 1500.0, "MACHINERY") for i in range(1, 13)]
        ),
    )
    r = check_query("privacy_k_anonymity", spark, sf)
    assert r.ok, str(r)


def test_l_diversity_homogeneous_groups_cross_engine(spark, tmp_path):
    """Large k-anonymous groups whose members all share the sensitive
    segment -> every group lands in the l=1 (homogeneity-disclosure)
    bucket on both engines."""
    sf = _mk_sf(
        tmp_path,
        customer=_customers(
            [(i, 1, 500.0, "HOUSEHOLD") for i in range(1, 9)]
            + [(i, 2, 2500.0, "FURNITURE") for i in range(9, 14)]
        ),
    )
    r = check_query("privacy_l_diversity", spark, sf)
    assert r.ok, str(r)
    rows = REGISTRY["privacy_l_diversity"].fn(spark, sf).collect()
    assert len(rows) == 1  # only the l=1 bucket is populated


# -- sessionization boundaries -----------------------------------------------


def test_sessionization_tied_timestamps_and_exact_gap_cross_engine(
    spark, tmp_path
):
    """Duplicate timestamps resolve by the event_id tiebreak; a gap of
    EXACTLY 30 minutes stays in-session (the boundary is strict >);
    30 minutes + 1 second opens a new one. Both engines must agree on
    the interval arithmetic."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-01 00:00:00", 1, "view", 1),
                (2, "2024-01-01 00:00:00", 1, "view", 2),   # tied ts
                (3, "2024-01-01 00:30:00", 1, "click", 3),  # exactly 30m
                (4, "2024-01-01 01:00:01", 1, "view", 4),   # 30m 1s -> new
                (5, "2024-01-01 05:00:00", 2, "view", 5),   # single event
            ]
        ),
    )
    r = check_query("events_sessionization", spark, sf)
    assert r.ok, str(r)
    rows = REGISTRY["events_sessionization"].fn(spark, sf).collect()
    u1 = sorted(
        (x for x in rows if x.user_id == 1), key=lambda x: x.session_seq
    )
    assert [x.n_events for x in u1] == [3, 1]
    assert len([x for x in rows if x.user_id == 2]) == 1


# -- funnel ordering ----------------------------------------------------------


def test_funnel_rejects_out_of_order_steps_cross_engine(spark, tmp_path):
    """A user whose click precedes their first view must NOT convert;
    a correctly ordered user must. Both engines."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                # out of order: click, then view, then purchase
                (1, "2024-01-01 00:00:00", 1, "click", 1),
                (2, "2024-01-01 01:00:00", 1, "view", 1),
                (3, "2024-01-01 02:00:00", 1, "purchase", 1),
                # correctly ordered
                (4, "2024-01-02 00:00:00", 2, "view", 1),
                (5, "2024-01-02 01:00:00", 2, "click", 1),
                (6, "2024-01-02 02:00:00", 2, "purchase", 1),
            ]
        ),
    )
    r = check_query("events_funnel", spark, sf)
    assert r.ok, str(r)


# -- drift monitors -----------------------------------------------------------


def test_ks_drift_identical_halves_cross_engine(spark, tmp_path):
    """A value distribution repeated identically in both halves of the
    month must produce zero drift on both engines."""
    rows, eid = [], 0
    for day in (2, 20):  # one day in each half
        for v in (10, 20, 30, 40, 50, 60, 70, 80):
            eid += 1
            rows.append((eid, f"2024-01-{day:02d} 12:00:00", eid, "view", v))
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("stat_ks_drift", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["stat_ks_drift"].fn(spark, sf).collect()[0]
    assert row.ks_x1e6 == 0


def test_cusum_constant_series_never_alarms_cross_engine(spark, tmp_path):
    """A perfectly constant daily volume cannot accumulate drift: all
    CUSUM statistics 0, no alarms, on both engines."""
    rows, eid = [], 0
    for day in range(1, 11):
        for j in range(5):
            eid += 1
            rows.append(
                (eid, f"2024-01-{day:02d} 0{j}:00:00", eid, "view", 1)
            )
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("events_cusum_changepoint", spark, sf)
    assert r.ok, str(r)
    for x in REGISTRY["events_cusum_changepoint"].fn(spark, sf).collect():
        assert x.cusum_pos_q == 0 and x.cusum_neg_q == 0 and x.alarm == 0


# -- language id --------------------------------------------------------------


def test_lang_id_und_branch_cross_engine(spark, tmp_path):
    """Docs hitting no stopword list at all must classify 'und' on
    both engines; a clear-stopword doc must not."""
    sf = _mk_sf(
        tmp_path,
        documents=_docs(
            [
                "zzz qqq www pppp",          # no stopwords -> und
                "the cat and the dog of it",  # english
                "el perro y la casa de un",   # spanish
            ]
        ),
    )
    r = check_query("text_lang_id", spark, sf)
    assert r.ok, str(r)
    pred = {
        x.doc_id: x.lang_pred
        for x in REGISTRY["text_lang_id"].fn(spark, sf).collect()
    }
    assert pred[0] == "und"
    assert pred[1] == "en"
    assert pred[2] == "es"


# -- temporal join boundaries ---------------------------------------------


def test_asof_join_exact_tie_and_no_prior_cross_engine(spark, tmp_path):
    """A purchase at EXACTLY the signup timestamp (the <=/< boundary),
    a purchase with no prior signup (NULL as-of side), and a purchase
    between two signups (must pick the LATEST prior) — both engines."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-02 00:00:00", 1, "signup", 0),
                (2, "2024-01-02 00:00:00", 1, "purchase", 10),  # tie
                (3, "2024-01-05 00:00:00", 1, "signup", 0),
                (4, "2024-01-06 00:00:00", 1, "purchase", 20),  # latest=Jan5
                (5, "2024-01-01 00:00:00", 2, "purchase", 30),  # no signup
            ]
        ),
    )
    r = check_query("events_asof_join", spark, sf)
    assert r.ok, str(r)
    rows = {
        x.event_id: x
        for x in REGISTRY["events_asof_join"].fn(spark, sf).collect()
    }
    assert rows[4].asof_ts is not None
    assert rows[4].asof_ts.day == 5  # latest prior, not the first
    assert rows[5].asof_ts is None  # left join keeps the orphan


def test_range_overlap_touching_intervals_cross_engine(spark, tmp_path):
    """Intervals that exactly TOUCH at an endpoint (one user's last
    event equals another's first) sit on the overlap predicate's
    boundary — banded equi-join and naive theta oracle must agree."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                # user 1: [00:00, 02:00]; user 2: [02:00, 04:00] (touch)
                (1, "2024-01-01 00:00:00", 1, "view", 1),
                (2, "2024-01-01 02:00:00", 1, "view", 1),
                (3, "2024-01-01 02:00:00", 2, "view", 1),
                (4, "2024-01-01 04:00:00", 2, "view", 1),
                # user 3: disjoint [10:00, 11:00]
                (5, "2024-01-01 10:00:00", 3, "view", 1),
                (6, "2024-01-01 11:00:00", 3, "view", 1),
                # user 4: point interval inside user 2's range
                (7, "2024-01-01 03:00:00", 4, "view", 1),
            ]
        ),
    )
    r = check_query("join_range_overlap", spark, sf)
    assert r.ok, str(r)


def test_gapfill_locf_single_point_and_long_gap_cross_engine(spark, tmp_path):
    """A key with a single observation (spine of one hour, nothing to
    fill) and a key with one long gap (many carried hours) — the LOCF
    carry and spine generation must agree across engines."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-01 00:30:00", 1, "view", 10),
                (2, "2024-01-01 00:45:00", 1, "view", 5),
                (3, "2024-01-01 06:15:00", 1, "view", 7),   # 5-hour gap
                (4, "2024-01-03 12:00:00", 2, "error", 99),  # single point
            ]
        ),
    )
    r = check_query("events_gapfill_locf", spark, sf)
    assert r.ok, str(r)
