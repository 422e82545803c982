"""Round-11 crafted-parquet differentials for the three queries whose
SQL changed this round (all three lead the round-11 driver window):

* stat_benford_digits — restaged via staged_sql_query (the r10
  judge's one `weak`: the inlined CTE chain re-derived orders x5) and
  given the r10-ADVICE precondition fix: amounts in (0, 0.01) floor
  to 0 cents, whose leading digit joins none of the 1-9 spine — they
  must be excluded from the total, not silently deflate every share.
* stat_anova_f — SSB/SSW kept DECIMAL(38,0) end-to-end (the old
  CAST-to-BIGINT NULLed on Spark / raised on DuckDB past ~9.2e18
  milli-sq-units) and SSB clamped at 0 (k per-group FLOORs vs one
  grand FLOOR can leave an all-means-equal input a few milli-units
  negative).
* stat_cohens_d — the zero-variance degenerate is now the exact
  integer MIN=MAX test per side (the old n·Σy² − s² comparison
  overflowed DECIMAL(38,0) earlier than its documented contract).

Each test runs the full Spark-vs-DuckDB hash comparison on inputs
the synthetic corpus never produces."""

from __future__ import annotations

import os

import pandas as pd

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

SF0001 = "/root/testdata/sf0.001"

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _mk_sf(tmp_path, **frames) -> str:
    sf = tmp_path / "sf"
    sf.mkdir(parents=True, exist_ok=True)
    for t in _TABLES:
        dst = sf / f"{t}.parquet"
        if t in frames:
            frames[t].to_parquet(str(dst))
        elif not dst.exists():
            os.symlink(f"{SF0001}/{t}.parquet", str(dst))
    return str(sf)


def _orders(prices):
    n = len(prices)
    return pd.DataFrame(
        {
            "o_orderkey": pd.array(range(n), dtype="int64"),
            "o_custkey": pd.array([i % 7 for i in range(n)], dtype="int64"),
            "o_orderstatus": pd.array(["F"] * n, dtype="object"),
            "o_totalprice": pd.array(prices, dtype="float64"),
            "o_orderdate": pd.to_datetime(["1997-01-15"] * n),
            "o_orderpriority": pd.array(["3-MEDIUM"] * n, dtype="object"),
        }
    )


def _events(rows):
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [None if r[4] is None else float(r[4]) for r in rows],
            "props": ["{}"] * len(rows),
        }
    )


def test_benford_subcent_amounts_excluded(spark, tmp_path):
    """Amounts in (0, 0.01) floor to 0 cents — digit '0'. They must
    not count toward the total: the 9 obs_shares must sum to 1 and
    both engines must agree bit-for-bit. Also covers negatives and
    exact 0.01/0.009999 boundary values."""
    prices = [0.004, 0.0099, 0.005, -3.5, 0.0, None] + [
        float(f"{d}.{i:02d}") for d in range(1, 10) for i in (7, 23)
    ]
    sf = _mk_sf(tmp_path, orders=_orders(prices))
    r = check_query("stat_benford_digits", spark, sf)
    assert r.ok, str(r)
    rows = REGISTRY["stat_benford_digits"].fn(spark, sf).collect()
    assert len(rows) == 9
    assert sum(x.n for x in rows) == 18  # the 9x2 valid rows only
    assert abs(sum(x.obs_share for x in rows) - 1.0) < 1e-12


def test_benford_empty_after_filter(spark, tmp_path):
    """Every row sub-cent: the staged total scalar is SQL NULL, and
    the NULL must propagate identically through both engines (the
    staged literal is a typed NULL, not the string 'None')."""
    sf = _mk_sf(tmp_path, orders=_orders([0.001, 0.0099, 0.0]))
    r = check_query("stat_benford_digits", spark, sf)
    assert r.ok, str(r)


def test_anova_equal_means_clamps_ssb(spark, tmp_path):
    """Three groups, each with cents {20, 30, 50}: all means are
    exactly 100/3 cents, so exact SSB = 0 — but each per-group
    s²/n·1000 = 3333333.3̄ floors to 3333333 while the grand floor is
    10000000 exactly, leaving the quantized SSB at −1 milli-unit.
    GREATEST must pin it to 0 so f_stat reads exactly 0.0 on both
    engines (pre-clamp, it read a tiny NEGATIVE F)."""
    rows = []
    for gi, g in enumerate(("a", "b", "c")):
        for vi, v in enumerate((0.20, 0.30, 0.50)):
            rid = gi * 3 + vi + 1
            rows.append((rid, f"2024-01-05 0{rid}:00:00", rid, g, v))
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("stat_anova_f", spark, sf)
    assert r.ok, str(r)
    out = {
        x.event_type: x.f_stat
        for x in REGISTRY["stat_anova_f"].fn(spark, sf).collect()
    }
    assert out == {"a": 0.0, "b": 0.0, "c": 0.0}


def test_anova_single_group_and_constant(spark, tmp_path):
    """k=1 (guard) and an all-constant group alongside a varying one
    (ssw from one group only) — both hash-exact."""
    rows = [
        (1, "2024-01-05 01:00:00", 1, "solo", 5.0),
        (2, "2024-01-05 02:00:00", 2, "solo", 5.0),
        (3, "2024-01-05 03:00:00", 3, "solo", 8.0),
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_anova_f", spark, sf).ok
    rows += [(4, "2024-01-05 04:00:00", 4, "flat", 2.0)] * 1
    rows += [(5, "2024-01-05 05:00:00", 5, "flat", 2.0)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(rows))
    assert check_query("stat_anova_f", spark, sf2).ok


def test_cohens_d_constant_sides_guard(spark, tmp_path):
    """Both halves constant (at different levels): pooled SD is 0 and
    d must pin to 0 via the MIN=MAX test — the mean shift alone must
    not produce a division by zero or an engine-dependent value.
    A second type has one side constant, the other varying: d is
    finite and must hash-match."""
    rows = [
        # type 'flat2': first half all 7.25, second half all 2.25
        (1, "2024-01-05 01:00:00", 1, "flat2", 7.25),
        (2, "2024-01-06 01:00:00", 2, "flat2", 7.25),
        (3, "2024-01-20 01:00:00", 3, "flat2", 2.25),
        (4, "2024-01-21 01:00:00", 4, "flat2", 2.25),
        # type 'half': first half constant, second half varies
        (5, "2024-01-05 01:00:00", 5, "half", 1.0),
        (6, "2024-01-06 01:00:00", 6, "half", 1.0),
        (7, "2024-01-20 01:00:00", 7, "half", 3.0),
        (8, "2024-01-21 01:00:00", 8, "half", 9.0),
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("stat_cohens_d", spark, sf)
    assert r.ok, str(r)
    out = {
        x.event_type: x.cohens_d
        for x in REGISTRY["stat_cohens_d"].fn(spark, sf).collect()
    }
    assert out["flat2"] == 0.0
    assert out["half"] != 0.0


def test_cohens_d_missing_side(spark, tmp_path):
    """One side empty (all events in the first half-month): n2 = 0
    pins d to 0; the per-side MIN over an empty CASE is NULL and must
    not poison the guard on either engine."""
    rows = [
        (1, "2024-01-05 01:00:00", 1, "early", 1.5),
        (2, "2024-01-06 01:00:00", 2, "early", 2.5),
        (3, "2024-01-07 01:00:00", 3, "early", 3.5),
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("stat_cohens_d", spark, sf)
    assert r.ok, str(r)
    out = REGISTRY["stat_cohens_d"].fn(spark, sf).collect()
    assert out[0].cohens_d == 0.0


# ---------------------------------------------------------------------------
# Round-11 additions (queued for the r12 driver window): python-model
# replays on the real sf0.001 corpus + crafted degenerate inputs.
# ---------------------------------------------------------------------------

import math

import numpy as np


def _f(x) -> float:
    return float(x)


def test_pr_auc_matches_python_model(spark):
    """avg_precision equals the quantized step-AP replayed in float64
    over the real sf0.001 events (same IEEE chain, same FLOOR)."""
    row = REGISTRY["ml_pr_auc"].fn(spark, SF0001).collect()[0]
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["value"].notna()]
    pos = ev["event_type"].eq("purchase").astype(int)
    g = (
        pd.DataFrame({"v": ev["value"], "c1": pos, "c2": 1 - pos})
        .groupby("v", sort=True)
        .sum()
        .reset_index()
    )
    p, total = int(g.c1.sum()), int((g.c1 + g.c2).sum())
    f1 = g.c1.cumsum().shift(fill_value=0).astype(int)  # strictly below
    fall = (g.c1 + g.c2).cumsum().shift(fill_value=0).astype(int)
    ap_q = 0
    for c1, f1b, fb in zip(g.c1, f1, fall):
        term = _f(c1) * (_f(p - f1b) / _f(total - fb)) * _f(1000000000)
        ap_q += math.floor(term)
    expect = (ap_q / 1e9) / p
    assert row.n_pos == p and row.n_neg == total - p
    assert row.n_thresholds == len(g)
    assert row.avg_precision == expect


def test_pr_auc_degenerates(spark, tmp_path):
    """All-negative corpus pins AP to 0 (P=0 guard); all-positive
    reads exactly 1 (every PP equals TP); both hash-match."""
    neg = [(i, "2024-01-05 01:00:00", i, "view", float(i % 5)) for i in range(1, 8)]
    sf = _mk_sf(tmp_path, events=_events(neg))
    assert check_query("ml_pr_auc", spark, sf).ok
    assert REGISTRY["ml_pr_auc"].fn(spark, sf).collect()[0].avg_precision == 0.0
    pos = [(i, "2024-01-05 01:00:00", i, "purchase", float(i % 3)) for i in range(1, 8)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(pos))
    assert check_query("ml_pr_auc", spark, sf2).ok
    r = REGISTRY["ml_pr_auc"].fn(spark, sf2).collect()[0]
    # every term floors 1.0*1e9 exactly: AP == 1 despite quantization
    assert r.avg_precision == 1.0


def test_cramers_v_matches_python_model(spark):
    """chi2/V equal the quantized contingency replay in float64 over
    the real sf0.001 events (full r x c spine, structural zeros in)."""
    row = REGISTRY["stat_cramers_v"].fn(spark, SF0001).collect()[0]
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["ts"].notna() & ev["event_type"].notna()]
    dow = pd.to_datetime(ev["ts"]).dt.isocalendar().day.astype(int)
    ct = pd.crosstab(ev["event_type"], dow)
    n = int(ct.values.sum())
    chi_q = 0
    for gi in ct.index:
        for dj in ct.columns:
            rm, cm = int(ct.loc[gi].sum()), int(ct[dj].sum())
            e = (_f(rm) * _f(cm)) / _f(n)
            o = _f(int(ct.loc[gi, dj]))
            chi_q += math.floor(((o - e) * (o - e) / e) * 1000000)
    nr, nc = ct.shape
    assert (row.n_events, row.n_types, row.n_dows) == (n, nr, nc)
    assert row.chi2_stat == chi_q / 1e6
    expect_v = math.sqrt((chi_q / 1e6) / (n * min(nr - 1, nc - 1)))
    assert row.cramers_v == expect_v


def test_cramers_v_degenerates(spark, tmp_path):
    """Single event_type (r=1) pins V to 0; perfect association
    (each type owns one weekday) reads V = 1 exactly up to the
    micro-quantization; both hash-match."""
    rows = [(i, f"2024-01-{15 + (i % 3)} 01:00:00", i, "only", 1.0) for i in range(1, 10)]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_cramers_v", spark, sf).ok
    assert REGISTRY["stat_cramers_v"].fn(spark, sf).collect()[0].cramers_v == 0.0
    # 2024-01-15 is a Monday: type tA always Monday, tB always Tuesday
    rows2 = [(i, "2024-01-15 01:00:00", i, "tA", 1.0) for i in range(1, 5)]
    rows2 += [(i + 10, "2024-01-16 01:00:00", i, "tB", 1.0) for i in range(1, 5)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(rows2))
    assert check_query("stat_cramers_v", spark, sf2).ok
    v = REGISTRY["stat_cramers_v"].fn(spark, sf2).collect()[0].cramers_v
    assert abs(v - 1.0) < 1e-5


def test_grubbs_matches_python_model(spark):
    """G and the outlier side equal the exact-moments replay over the
    real sf0.001 orders."""
    row = REGISTRY["stat_grubbs_outlier"].fn(spark, SF0001).collect()[0]
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    y = np.floor(o["o_totalprice"].dropna().to_numpy(dtype=np.float64) * 100).astype(np.int64)
    n, s, ss = len(y), int(y.sum()), int((y.astype(object) ** 2).sum())
    mn, mx = int(y.min()), int(y.max())
    dev_hi, dev_lo = n * mx - s, s - n * mn
    expect_out = mx if dev_hi >= dev_lo else mn
    g = (_f(max(dev_hi, dev_lo)) / _f(n)) / math.sqrt(
        (_f(ss) - _f(s) * _f(s) / _f(n)) / _f(n - 1)
    )
    assert row.n_orders == n
    assert row.outlier_cents == expect_out
    assert row.g_stat == g


def test_grubbs_degenerates(spark, tmp_path):
    """Constant column and n=2 pin G to 0 with a NULL outlier; a
    low-side outlier is reported as the MIN."""
    sf = _mk_sf(tmp_path, orders=_orders([5.0, 5.0, 5.0]))
    assert check_query("stat_grubbs_outlier", spark, sf).ok
    r = REGISTRY["stat_grubbs_outlier"].fn(spark, sf).collect()[0]
    assert r.g_stat == 0.0 and r.outlier_cents is None
    sf2 = _mk_sf(tmp_path / "b", orders=_orders([1.0, 9.0]))
    assert check_query("stat_grubbs_outlier", spark, sf2).ok
    assert REGISTRY["stat_grubbs_outlier"].fn(spark, sf2).collect()[0].g_stat == 0.0
    sf3 = _mk_sf(tmp_path / "c", orders=_orders([10.0, 10.5, 9.75, -50.0, 10.25]))
    assert check_query("stat_grubbs_outlier", spark, sf3).ok
    assert REGISTRY["stat_grubbs_outlier"].fn(spark, sf3).collect()[0].outlier_cents == -5000


def test_ljung_box_matches_python_model(spark):
    """Q equals the quantized replay over the daily counts of the
    real sf0.001 events (exact BIGINT acf legs, float64 terms)."""
    row = REGISTRY["stat_ljung_box"].fn(spark, SF0001).collect()[0]
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    # the driver parquet is datetime64[us]: normalize to ns first, or
    # the int64 view is microseconds and every day collapses into one
    ts = pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
    dn = (ts.astype("int64") // 10**9 // 86400).astype(int)
    daily = dn.value_counts().sort_index()
    days, total = len(daily), int(daily.sum())
    e = {int(d): int(x) * days - total for d, x in daily.items()}
    den = sum(v * v for v in e.values())
    sum_q = 0
    for lag in range(1, 8):
        num = sum(e[d] * e.get(d + lag, 0) for d in e if d + lag in e)
        pairs = sum(1 for d in e if d + lag in e)
        if den == 0 or pairs == 0 or days <= lag:
            continue
        rho = _f(num) / _f(den)
        sum_q += math.floor((rho * rho / _f(days - lag)) * 1000000000000)
    expect = _f(days) * _f(days + 2) * (sum_q / 1e12)
    assert row.n_days == days and row.h == 7
    assert row.q_stat == expect


def test_ljung_box_degenerates(spark, tmp_path):
    """Constant daily volume (den=0) and a single-day corpus (no
    pairs) both pin Q to 0; hash-exact on both."""
    rows = []
    rid = 1
    for d in range(15, 19):  # 4 days x 3 events: constant series
        for _ in range(3):
            rows.append((rid, f"2024-01-{d} 0{rid % 9}:00:00", rid, "view", 1.0))
            rid += 1
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_ljung_box", spark, sf).ok
    assert REGISTRY["stat_ljung_box"].fn(spark, sf).collect()[0].q_stat == 0.0
    one = [(1, "2024-01-15 01:00:00", 1, "view", 1.0)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(one))
    assert check_query("stat_ljung_box", spark, sf2).ok
    assert REGISTRY["stat_ljung_box"].fn(spark, sf2).collect()[0].q_stat == 0.0
