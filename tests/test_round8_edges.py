"""Edge-input DIFFERENTIAL tests for the round-8 queries: run the
full Spark-vs-DuckDB oracle comparison (`oracle.check_query`) on
crafted parquet datasets that the synthetic corpus never produces —
empty/vowel-free/punctuation-free documents, all-censored and
all-extinct survival cohorts, clickless and single-arm experiments,
zero-positive encoding categories. The graded sweeps prove parity on
the driver's data; these prove the guard branches (GREATEST floors,
extinct sentinel, NULL uplift) agree across engines too."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from aws_etl_spark.oracle import check_query

SF0001 = "/root/testdata/sf0.001"


def _mk_sf(tmp_path, **frames) -> str:
    """A scratch sf_dir: every standard table symlinked from sf0.001,
    the given tables replaced with crafted pandas frames."""
    from aws_etl_spark.queries.registry import ALL_TABLES

    d = tmp_path / "sf_edge"
    d.mkdir()
    for t in ALL_TABLES:
        os.symlink(f"{SF0001}/{t}.parquet", d / f"{t}.parquet")
    for t, pdf in frames.items():
        os.remove(d / f"{t}.parquet")
        pdf.to_parquet(d / f"{t}.parquet")
    return str(d)


def _docs(texts):
    return pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"src{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
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


# -- text_readability_score ---------------------------------------------------


def test_readability_guard_branches_cross_engine(spark, tmp_path):
    """Empty text, whitespace-only, vowel-free, punctuation-free,
    single-char and unicode docs must hash-match DuckDB (the
    GREATEST(...,1) floors fire on both engines identically)."""
    sf = _mk_sf(
        tmp_path,
        documents=_docs(
            [
                "",
                "   ",
                "xzpt qrw brrr",
                "no punctuation here at all",
                "One. Two! Three? Four.",
                "q",
                "a.b.c!?.",
                "naïve café résumé.",
                "multiple   spaces   between",
            ]
        ),
    )
    r = check_query("text_readability_score", spark, sf)
    assert r.ok, str(r)
    assert r.rows_spark == 9


# -- text_zipf_fit ------------------------------------------------------------


def test_zipf_fit_skewed_and_uniform_cross_engine(spark, tmp_path):
    """A two-doc skewed corpus and a perfectly uniform corpus (every
    rank tied — tiebreak order decides) must both hash-match."""
    skew = _mk_sf(
        tmp_path,
        documents=_docs(["a a a a a a b b b c c d", "a a b c d e f g"]),
    )
    r = check_query("text_zipf_fit", spark, skew)
    assert r.ok, str(r)

    uni_dir = tmp_path / "uni"
    uni_dir.mkdir()
    uni = _mk_sf(uni_dir, documents=_docs(["w x y z", "w x y z"]))
    r2 = check_query("text_zipf_fit", spark, uni)
    assert r2.ok, str(r2)


# -- corpus_epoch_planner -----------------------------------------------------


def test_epoch_planner_unweighted_sources_cross_engine(spark, tmp_path):
    """Sources outside the weight CASE (default weight 1) and a
    single-doc source must plan identically on both engines."""
    sf = _mk_sf(
        tmp_path,
        documents=_docs(
            ["alpha beta gamma"] * 5 + ["one two"] + ["x " * 50]
        ).assign(source=["src0"] * 5 + ["weird_tail"] + ["src9"]),
    )
    r = check_query("corpus_epoch_planner", spark, sf)
    assert r.ok, str(r)
    assert r.rows_spark == 3


# -- events_survival_km -------------------------------------------------------


def test_km_all_censored_cohort_cross_engine(spark, tmp_path):
    """No qualifying purchase anywhere: one fully-censored exit row,
    survival stays at 1e6 — both engines."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-01 00:00:00", 1, "view", 10),
                (2, "2024-01-05 00:00:00", 1, "purchase", 100),
                (3, "2024-01-02 00:00:00", 2, "view", 10),
                (4, "2024-01-09 00:00:00", 2, "purchase", 200),
            ]
        ),
    )
    r = check_query("events_survival_km", spark, sf)
    assert r.ok, str(r)
    from aws_etl_spark.queries.registry import REGISTRY

    rows = REGISTRY["events_survival_km"].fn(spark, sf).collect()
    assert all(x.deaths == 0 for x in rows)
    assert all(x.km_survival_e6 == 10**6 for x in rows)


def test_km_extinct_cohort_hits_sentinel_branch_cross_engine(spark, tmp_path):
    """Every user dies (high-value purchase) — the deaths == at_risk
    sentinel and extinct_cum flag must fire identically on both
    engines, forcing survival to exactly 0."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-01 00:00:00", 1, "view", 10),
                (2, "2024-01-03 00:00:00", 1, "purchase", 400),
                (3, "2024-01-01 00:00:00", 2, "view", 10),
                (4, "2024-01-06 00:00:00", 2, "purchase", 300),
            ]
        ),
    )
    r = check_query("events_survival_km", spark, sf)
    assert r.ok, str(r)
    from aws_etl_spark.queries.registry import REGISTRY

    rows = sorted(
        REGISTRY["events_survival_km"].fn(spark, sf).collect(),
        key=lambda x: x.duration_days,
    )
    assert rows[-1].km_survival_e6 == 0
    assert sum(x.deaths for x in rows) == 2


# -- events_ab_exposure_uplift ------------------------------------------------


def test_uplift_no_clicks_is_empty_on_both_engines(spark, tmp_path):
    """No qualifying exposure event anywhere -> nobody is exposed ->
    an EMPTY readout (not a zero-filled one) on both engines."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-01 00:00:00", 1, "view", 10),
                (2, "2024-01-01 01:00:00", 1, "purchase", 50),
            ]
        ),
    )
    r = check_query("events_ab_exposure_uplift", spark, sf)
    assert r.ok, str(r)
    assert r.rows_spark == 0


def test_uplift_single_arm_yields_null_uplift_cross_engine(spark, tmp_path):
    """With every exposed user hashed into one arm, the other arm's
    MAX(CASE...) is NULL, so uplift must be NULL — and both engines
    must agree on that NULL."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-01 00:00:00", 7, "click", 1),
                (2, "2024-01-01 00:10:00", 7, "purchase", 5),
            ]
        ),
    )
    r = check_query("events_ab_exposure_uplift", spark, sf)
    assert r.ok, str(r)
    assert r.rows_spark == 1
    from aws_etl_spark.queries.registry import REGISTRY

    row = REGISTRY["events_ab_exposure_uplift"].fn(spark, sf).collect()[0]
    assert row.uplift is None
    assert row.converters == 1  # purchase 10 min after the click


# -- ml_target_encoding -------------------------------------------------------


def test_target_encoding_zero_positive_category_cross_engine(spark, tmp_path):
    """A category whose customers have no fulfilled orders (and a
    customer with no orders at all) must shrink toward the prior on
    both engines."""
    customer = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4],
            "c_name": ["a", "b", "c", "d"],
            "c_nationkey": [0, 0, 1, 1],
            "c_acctbal": [1.0, 2.0, 3.0, 4.0],
            "c_mktsegment": ["WIN", "WIN", "LOSE", "LOSE"],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [10, 11],
            "o_custkey": [1, 2],
            "o_orderstatus": ["F", "F"],
            "o_totalprice": [5.0, 6.0],
            "o_orderdate": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "o_orderpriority": ["1-URGENT", "1-URGENT"],
        }
    )
    sf = _mk_sf(tmp_path, customer=customer, orders=orders)
    r = check_query("ml_target_encoding", spark, sf)
    assert r.ok, str(r)
    from aws_etl_spark.queries.registry import REGISTRY

    rows = {
        (x.feature, x.category): x
        for x in REGISTRY["ml_target_encoding"].fn(spark, sf).collect()
    }
    win, lose = rows[("mktsegment", "WIN")], rows[("mktsegment", "LOSE")]
    assert win.pos == 2 and lose.pos == 0
    # shrinkage: both sit strictly between their raw rate and 0.5
    assert 0.5 < win.target_enc < 1.0
    assert 0.0 < lose.target_enc < 0.5
