"""Mechanism pins for the round-8 additions: readability scoring,
Zipf rank-frequency fit, the epoch planner, target encoding, exposure
uplift, and Kaplan-Meier survival. Cross-engine hash parity is proven
by the oracle sweep; these tests pin the ALGORITHMS against
independent replays (pure Python over the same parquet) and the
structural identities a green hash alone would not localize."""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb

from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded


def _run(name, spark, sf_dir):
    _ensure_loaded()
    return REGISTRY[name].fn(spark, sf_dir)


def _docs(sf_dir):
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


# -- text_readability_score --------------------------------------------------


def test_readability_counts_replay_from_raw_text(spark, sf_dir):
    """Words/sentences/syllables must equal a Python regex replay, and
    the Flesch score must equal the formula on those exact counts."""
    rows = {r.doc_id: r for r in _run("text_readability_score", spark, sf_dir).collect()}
    raw = dict(_docs(sf_dir))
    assert set(rows) == set(raw)
    for doc_id, text in raw.items():
        r = rows[doc_id]
        w = max(len(text.strip().split(" ")), 1)
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        y = max(len(re.findall(r"[aeiouy]+", text.lower())), 1)
        assert (r.n_words, r.n_sentences, r.n_syllables) == (w, s, y), doc_id
        expect = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert abs(r.flesch - expect) < 1e-9, (doc_id, r.flesch, expect)


def test_readability_bands_partition_the_score_axis(spark, sf_dir):
    """Band assignment must be exactly the 70/50/30 thresholds applied
    to the integer num-vs-k*den comparison (i.e. to the score)."""
    for r in _run("text_readability_score", spark, sf_dir).collect():
        if r.flesch >= 70:
            assert r.readability_band == "easy", r
        elif r.flesch >= 50:
            assert r.readability_band == "standard", r
        elif r.flesch >= 30:
            assert r.readability_band == "difficult", r
        else:
            assert r.readability_band == "very_difficult", r


# -- text_zipf_fit -----------------------------------------------------------


def _zipf_replay(sf_dir):
    freq = Counter()
    for _, text in _docs(sf_dir):
        freq.update(w for w in text.strip().lower().split(" ") if w)
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    pts = [
        (math.floor(math.log(r) * 1e6), math.floor(math.log(f) * 1e6))
        for r, (_, f) in enumerate(top, start=1)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / 1e6
    return n, slope, intercept


def test_zipf_fit_equals_pure_python_regression(spark, sf_dir):
    """The emitted slope/intercept must equal an independent pure-
    Python tokenize -> count -> rank -> quantized-OLS replay."""
    row = _run("text_zipf_fit", spark, sf_dir).collect()[0]
    n, slope, intercept = _zipf_replay(sf_dir)
    assert row.n_ranks == n
    assert abs(row.zipf_slope - slope) < 1e-12
    assert abs(row.zipf_intercept_ln - intercept) < 1e-12
    # natural-language-shaped synthetic corpus: decaying, not flat
    assert row.zipf_slope < -0.1


# -- corpus_epoch_planner ----------------------------------------------------


def test_epoch_planner_identities_replay(spark, sf_dir):
    """Targets, epochs, deficits and multipliers must reproduce from
    the per-source token supplies (counted independently) and satisfy
    the planner identities: sum(target) <= budget < sum(target)+wsum,
    epochs = ceil(target/supply), deficit = max(target-supply, 0)."""
    rows = _run("corpus_epoch_planner", spark, sf_dir).collect()
    sup = duckdb.sql(
        f"""SELECT source, SUM(LEN(STRING_SPLIT(TRIM(text), ' '))) AS t,
                   COUNT(*) AS n
            FROM '{sf_dir}/documents.parquet' GROUP BY source"""
    ).fetchall()
    supply = {s: (int(t), int(n)) for s, t, n in sup}
    total = sum(t for t, _ in supply.values())
    budget = 3 * total
    wsum = sum(
        {"src0": 40, "src1": 20, "src2": 10}.get(s, 1) for s in supply
    )
    seen_multi, seen_sub = False, False
    for r in rows:
        w = {"src0": 40, "src1": 20, "src2": 10}.get(r.source, 1)
        t_sup, n_docs = supply[r.source]
        assert (r.weight, r.supply_tokens, r.n_docs) == (w, t_sup, n_docs)
        assert r.target_tokens == (w * budget) // wsum
        assert r.epochs_needed == -((-r.target_tokens) // t_sup)  # ceil
        assert r.deficit_tokens == max(r.target_tokens - t_sup, 0)
        assert abs(r.epoch_multiplier - r.target_tokens / t_sup) < 1e-12
        seen_multi |= r.epochs_needed > 1
        seen_sub |= r.epoch_multiplier < 1
    # the 3x budget with 40:20:10:1... weights must exercise BOTH branches
    assert seen_multi and seen_sub


# -- ml_target_encoding ------------------------------------------------------


def test_target_encoding_shrinks_toward_global_rate(spark, sf_dir):
    """enc must recompute from the emitted counts, and shrinkage must
    hold: every encoding lies between the raw category rate and the
    global rate (the whole point of the m=100 prior)."""
    rows = _run("ml_target_encoding", spark, sf_dir).collect()
    seg = [r for r in rows if r.feature == "mktsegment"]
    n_all = sum(r.n for r in seg)
    pos_all = sum(r.pos for r in seg)
    p_global = pos_all / n_all
    for r in rows:
        enc = (r.pos * n_all + 100 * pos_all) / (n_all * (r.n + 100))
        assert abs(r.target_enc - enc) < 1e-15, r
        assert abs(r.lift_vs_global - enc * n_all / pos_all) < 1e-12, r
        raw = r.pos / r.n if r.n else p_global
        lo, hi = sorted((raw, p_global))
        assert lo - 1e-12 <= r.target_enc <= hi + 1e-12, r
    # both feature families present with full category coverage
    assert {r.feature for r in rows} == {"mktsegment", "nation"}
    nat = [r for r in rows if r.feature == "nation"]
    assert sum(r.n for r in nat) == n_all  # partitions of the same users


# -- events_ab_exposure_uplift -----------------------------------------------


def test_exposure_uplift_readout_identities(spark, sf_dir):
    """Two arms, uplift = rate1 - rate0 from the emitted counts, and
    exposure must be a real filter (exposed <= distinct users)."""
    rows = sorted(
        _run("events_ab_exposure_uplift", spark, sf_dir).collect(),
        key=lambda r: r.variant,
    )
    assert [r.variant for r in rows] == [0, 1]
    r0, r1 = rows
    for r in rows:
        assert 0 <= r.converters <= r.exposed_users
        assert abs(r.conversion_rate - r.converters / r.exposed_users) < 1e-15
    uplift = r1.converters / r1.exposed_users - r0.converters / r0.exposed_users
    assert abs(r0.uplift - uplift) < 1e-15
    assert r0.uplift == r1.uplift
    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert r0.exposed_users + r1.exposed_users <= n_users


def test_exposure_starts_at_first_clicking_session(spark, sf_dir):
    """The exposure definition must be session-boundary: conversion
    counts purchases in the 24h window from the START of the first
    session containing a click — replayed independently."""
    events = duckdb.sql(
        f"""SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
            FROM '{sf_dir}/events.parquet' ORDER BY user_id, ts"""
    ).fetchall()
    by_user = {}
    for uid, ts, et in events:
        by_user.setdefault(uid, []).append((ts, et))
    import datetime

    gap = datetime.timedelta(minutes=30)
    exposed = {}
    for uid, evs in by_user.items():
        start, prev, exposure = None, None, None
        sess_start, sess_has_click = None, False
        for ts, et in evs:
            if prev is None or ts > prev + gap:
                if sess_has_click and exposure is None:
                    exposure = sess_start
                sess_start, sess_has_click = ts, False
            sess_has_click |= et == "click"
            prev = ts
        if sess_has_click and exposure is None:
            exposure = sess_start
        if exposure is not None:
            cutoff = exposure + datetime.timedelta(hours=24)
            exposed[uid] = any(
                et == "purchase" and exposure <= ts < cutoff
                for ts, et in evs
            )
    rows = _run("events_ab_exposure_uplift", spark, sf_dir).collect()
    assert sum(r.exposed_users for r in rows) == len(exposed)
    assert sum(r.converters for r in rows) == sum(exposed.values())


# -- events_survival_km ------------------------------------------------------


def test_km_product_limit_identities(spark, sf_dir):
    """The risk-set recurrence, the quantized log-space product and
    the monotone survival curve must all hold exactly."""
    rows = sorted(
        _run("events_survival_km", spark, sf_dir).collect(),
        key=lambda r: r.duration_days,
    )
    assert rows, "empty KM curve"
    cum = 0
    prev_surv = 10**6 + 1
    for i, r in enumerate(rows):
        exits = r.deaths + r.censored
        if i + 1 < len(rows):
            assert rows[i + 1].at_risk == r.at_risk - exits, r
        if r.deaths and r.deaths < r.at_risk:
            cum += math.floor(
                math.log((r.at_risk - r.deaths) / r.at_risk) * 1e6
            )
        assert r.log_surv_micros == cum, r
        assert r.km_survival_e6 == math.floor(math.exp(cum / 1e6) * 1e6)
        assert r.km_survival_e6 <= prev_surv
        prev_surv = r.km_survival_e6
    # the first at_risk is the full cohort
    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert rows[0].at_risk == n_users
    # censoring is real on this corpus: the curve must NOT hit zero
    assert rows[-1].censored > 0 and rows[-1].km_survival_e6 > 0
