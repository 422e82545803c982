"""Round-12 additions: python-model replays against the corpus plus
crafted degenerate differentials for each of the ten new operators
(stat_mann_kendall, stat_durbin_watson, events_dispersion_index,
ml_log_loss, ml_fleiss_kappa, stat_bartlett, stat_friedman_test,
text_msttr, text_hapax_ratio, corpus_doclen_gini).

Replays recompute the exact integer/quantization chains the SQL
declares (truncating DIV where the SQL uses DIV/HUGEINT //, math.floor
where it uses FLOOR — FLOOR floors on both engines, negatives
included) so equality asserts are exact, not approximate."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
from tests.test_round11_late import (
    SF0001,
    _coin,
    _docs,
    _events,
    _mk_sf,
    _orders,
    _tdiv,
)

_ensure_loaded()


def _epoch_days(series: pd.Series) -> pd.Series:
    """Epoch-day numbers, robust to the parquet datetime unit
    (sf parquet is datetime64[us]; crafted frames vary)."""
    days = pd.to_datetime(series).dropna().dt.floor("D")
    return (days - pd.Timestamp("1970-01-01")).dt.days


def _daily_order_counts(sf=SF0001):
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    return Counter(_epoch_days(orders["o_orderdate"]).tolist())


def _daily_event_counts(sf=SF0001):
    ev = pd.read_parquet(f"{sf}/events.parquet")
    return Counter(_epoch_days(ev["ts"]).tolist())


# ---------------------------------------------------------------------------
# stat_mann_kendall
# ---------------------------------------------------------------------------


def _mk_replay(daily: dict[int, int]):
    days = sorted(daily)
    xs = [daily[d] for d in days]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(xs)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values()
    )
    if var18 <= 0 or s == 0:
        z = 0.0
    elif s > 0:
        z = float(s - 1) / math.sqrt(float(var18) / 18.0)
    else:
        z = float(s + 1) / math.sqrt(float(var18) / 18.0)
    flag = int(
        var18 > 0
        and s != 0
        and (abs(s) - 1) * (abs(s) - 1) * 180000 >= 38416 * var18
    )
    return n, s, var18, z, flag


def test_mann_kendall_matches_python_model(spark):
    row = REGISTRY["stat_mann_kendall"].fn(spark, SF0001).collect()[0]
    n, s, var18, z, flag = _mk_replay(_daily_order_counts())
    assert (row.n_days, row.s_stat, row.var_s_x18) == (n, s, var18)
    assert row.z_stat == z
    assert row.trend_5pct == flag


def test_mann_kendall_trend_and_tied_degenerates(spark, tmp_path):
    """A strictly rising daily series flags a 5% trend (S = n(n-1)/2);
    an all-tied series pins z to 0 via var18 <= 0; the oracle
    hash-matches on both."""
    dates = [f"2024-03-{d:02d}" for d in range(1, 11) for _ in range(d)]
    sf = _mk_sf(tmp_path, orders=_orders([100.0 + i for i in range(len(dates))],
                                         dates=dates))
    assert check_query("stat_mann_kendall", spark, sf).ok
    row = REGISTRY["stat_mann_kendall"].fn(spark, sf).collect()[0]
    assert row.s_stat == 45  # 10 strictly rising days -> C(10,2)
    assert row.trend_5pct == 1 and row.z_stat > 1.96

    flat = [f"2024-03-{d:02d}" for d in range(1, 11) for _ in range(3)]
    sf2 = _mk_sf(tmp_path / "b", orders=_orders([50.0] * len(flat), dates=flat))
    assert check_query("stat_mann_kendall", spark, sf2).ok
    row2 = REGISTRY["stat_mann_kendall"].fn(spark, sf2).collect()[0]
    assert (row2.s_stat, row2.z_stat, row2.trend_5pct) == (0, 0.0, 0)
    assert row2.var_s_x18 <= 0


def test_mann_kendall_guard_trips(spark, tmp_path):
    from aws_etl_spark.queries.timeseries_queries import (
        KENDALL_MAX_SPINE_ROWS,
    )

    n = KENDALL_MAX_SPINE_ROWS + 1
    dates = pd.date_range("1800-01-01", periods=n, freq="D")
    sf = _mk_sf(tmp_path, orders=_orders([10.0] * n, dates=dates))
    with pytest.raises(ValueError, match="mk_spine_rows"):
        REGISTRY["stat_mann_kendall"].fn(spark, sf)


# ---------------------------------------------------------------------------
# stat_durbin_watson
# ---------------------------------------------------------------------------


def _dw_replay(daily: dict[int, int]):
    days = sorted(daily)
    n = len(days)
    total = sum(daily.values())
    e = [daily[d] * n - total for d in days]
    den = sum(v * v for v in e)
    if n < 2 or den == 0:
        return n, 2.0
    num = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
    return n, float(num) / float(den)


def test_durbin_watson_matches_python_model(spark):
    row = REGISTRY["stat_durbin_watson"].fn(spark, SF0001).collect()[0]
    n, dw = _dw_replay(_daily_event_counts())
    assert row.n_days == n
    assert row.dw_stat == dw


def test_durbin_watson_degenerates(spark, tmp_path):
    """Alternating daily volume drives DW toward 4 (negative serial
    correlation); a constant series pins the 2.0 null; a single day
    pins 2.0 via n < 2."""
    rows = []
    eid = 0
    for d in range(1, 11):
        for k in range(5 if d % 2 == 0 else 1):
            rows.append((f"e{eid}", f"2024-04-{d:02d} 01:00:00", "u0",
                         "view", 1.0))
            eid += 1
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_durbin_watson", spark, sf).ok
    row = REGISTRY["stat_durbin_watson"].fn(spark, sf).collect()[0]
    assert row.dw_stat > 3.0
    _, dw = _dw_replay({d: (5 if d % 2 == 0 else 1) for d in range(1, 11)})
    assert row.dw_stat == dw

    flat = [(f"c{i}", f"2024-04-{(i % 10) + 1:02d} 02:00:00", "u0", "view", 1.0)
            for i in range(20)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(flat))
    assert check_query("stat_durbin_watson", spark, sf2).ok
    assert REGISTRY["stat_durbin_watson"].fn(spark, sf2).collect()[0].dw_stat == 2.0

    one = [("z0", "2024-04-01 03:00:00", "u0", "view", 1.0)]
    sf3 = _mk_sf(tmp_path / "c", events=_events(one))
    assert check_query("stat_durbin_watson", spark, sf3).ok
    assert REGISTRY["stat_durbin_watson"].fn(spark, sf3).collect()[0].dw_stat == 2.0


# ---------------------------------------------------------------------------
# events_dispersion_index
# ---------------------------------------------------------------------------


def test_dispersion_matches_python_model(spark):
    row = REGISTRY["events_dispersion_index"].fn(spark, SF0001).collect()[0]
    daily = _daily_event_counts()
    n, total = len(daily), sum(daily.values())
    ss = sum(v * v for v in daily.values())
    num = n * ss - total * total
    assert row.n_days == n
    assert row.mean_daily == float(total) / float(n)
    assert row.fano_factor == float(num) / (float(n - 1) * float(total))
    assert row.overdispersed == int(num > (n - 1) * total)


def test_dispersion_degenerates(spark, tmp_path):
    """A constant daily series reads Fano = 0 (underdispersed, flag 0);
    a bursty one flags; a single day pins 0 via n < 2."""
    flat = [(f"e{i}", f"2024-05-{(i % 10) + 1:02d} 01:00:00", "u0", "view", 1.0)
            for i in range(30)]
    sf = _mk_sf(tmp_path, events=_events(flat))
    assert check_query("events_dispersion_index", spark, sf).ok
    row = REGISTRY["events_dispersion_index"].fn(spark, sf).collect()[0]
    assert (row.fano_factor, row.overdispersed) == (0.0, 0)

    bursty = [(f"b{i}", "2024-05-01 01:00:00", "u0", "view", 1.0)
              for i in range(99)]
    bursty.append(("b99", "2024-05-02 01:00:00", "u0", "view", 1.0))
    sf2 = _mk_sf(tmp_path / "b", events=_events(bursty))
    assert check_query("events_dispersion_index", spark, sf2).ok
    row2 = REGISTRY["events_dispersion_index"].fn(spark, sf2).collect()[0]
    assert row2.overdispersed == 1 and row2.fano_factor > 1.0

    one = [("z0", "2024-05-01 01:00:00", "u0", "view", 1.0)]
    sf3 = _mk_sf(tmp_path / "c", events=_events(one))
    assert check_query("events_dispersion_index", spark, sf3).ok
    row3 = REGISTRY["events_dispersion_index"].fn(spark, sf3).collect()[0]
    assert (row3.n_days, row3.fano_factor, row3.overdispersed) == (1, 0.0, 0)


# ---------------------------------------------------------------------------
# ml_log_loss
# ---------------------------------------------------------------------------


def _log_loss_replay(orders: pd.DataFrame):
    n = len(orders)
    pos = 0
    ll_q = 0
    for _, r in orders.iterrows():
        y = int(r["o_orderpriority"] in ("1-URGENT", "2-HIGH"))
        pos += y
        coin = _coin(f"cal#{int(r['o_orderkey'])}")
        p = (2.0 * coin + 1.0) / 131072.0
        term = math.log(p) if y == 1 else math.log(1.0 - p)
        ll_q += math.floor(term * 1000000)
    if n == 0:
        return 0, 0, 0.0, 0.0, 0.0
    ll = -(float(ll_q) / 1e6) / float(n)
    base = 0.0
    if 0 < pos:
        base += float(pos) * math.log(float(pos) / float(n))
    if pos < n:
        base += float(n - pos) * math.log(float(n - pos) / float(n))
    base = -base / float(n)
    skill = 0.0 if base == 0 else 1.0 - ll / base
    return n, pos, ll, base, skill


def test_log_loss_matches_python_model(spark):
    row = REGISTRY["ml_log_loss"].fn(spark, SF0001).collect()[0]
    n, pos, ll, base, skill = _log_loss_replay(
        pd.read_parquet(f"{SF0001}/orders.parquet")
    )
    assert (row.n_orders, row.n_pos) == (n, pos)
    assert row.log_loss == ll
    assert row.baseline_ll == base
    assert row.skill_score == skill


def test_log_loss_one_class_and_empty(spark, tmp_path):
    """An all-positive corpus pins the missing baseline term in integer
    space (baseline = -ln(1) = 0 -> skill 0); the empty table reads the
    all-zero row on both engines."""
    sf = _mk_sf(
        tmp_path, orders=_orders([10.0] * 6, priorities=["1-URGENT"] * 6)
    )
    assert check_query("ml_log_loss", spark, sf).ok
    row = REGISTRY["ml_log_loss"].fn(spark, sf).collect()[0]
    assert (row.n_pos, row.baseline_ll, row.skill_score) == (6, 0.0, 0.0)
    assert row.log_loss > 0.0

    sf2 = _mk_sf(tmp_path / "b", orders=_orders([]))
    assert check_query("ml_log_loss", spark, sf2).ok
    row2 = REGISTRY["ml_log_loss"].fn(spark, sf2).collect()[0]
    assert (row2.n_orders, row2.log_loss, row2.skill_score) == (0, 0.0, 0.0)


# ---------------------------------------------------------------------------
# ml_fleiss_kappa
# ---------------------------------------------------------------------------


def _fleiss_replay(orders: pd.DataFrame):
    n = len(orders)
    a = t1 = 0
    for _, r in orders.iterrows():
        y = int(r["o_orderpriority"] in ("1-URGENT", "2-HIGH"))
        n1 = 0
        for j in (1, 2, 3):
            coin = _coin(f"fl{j}#{int(r['o_orderkey'])}")
            vote = (1 - y) if coin < 9830 else y
            n1 += vote
        a += n1 * (n1 - 1) + (3 - n1) * (2 - n1)
        t1 += n1
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    t0 = 3 * n - t1
    b = t1 * t1 + t0 * t0
    p_bar = float(a) / (6.0 * float(n))
    p_e = float(b) / (9.0 * float(n) * float(n))
    den = 18 * n * n - 2 * b
    kappa = 0.0 if den == 0 else float(3 * n * a - 2 * b) / float(den)
    return n, p_bar, p_e, kappa


def test_fleiss_matches_python_model(spark):
    row = REGISTRY["ml_fleiss_kappa"].fn(spark, SF0001).collect()[0]
    n, p_bar, p_e, kappa = _fleiss_replay(
        pd.read_parquet(f"{SF0001}/orders.parquet")
    )
    assert (row.n_items, row.m_raters) == (n, 3)
    assert row.p_bar == p_bar
    assert row.p_e == p_e
    assert row.fleiss_kappa == kappa
    assert 0.3 < kappa < 0.7  # the 15%-flip construction is non-trivial


def test_fleiss_all_one_category_pins_zero(spark, tmp_path):
    """Items where all three raters vote the same single category give
    P_e = 1 (denominator 0) — kappa pins to 0 in integer space. Found
    by searching orderkeys whose three 'fl' coins all read >= 9830
    (no flip) with y = 0."""
    keys = [
        k
        for k in range(1, 4000)
        if all(_coin(f"fl{j}#{k}") >= 9830 for j in (1, 2, 3))
    ][:4]
    assert len(keys) == 4, "need 4 no-flip orderkeys"
    orders = _orders([10.0] * len(keys))
    orders["o_orderkey"] = pd.array(keys, dtype="int64")
    sf = _mk_sf(tmp_path, orders=orders)
    assert check_query("ml_fleiss_kappa", spark, sf).ok
    row = REGISTRY["ml_fleiss_kappa"].fn(spark, sf).collect()[0]
    assert (row.p_bar, row.p_e, row.fleiss_kappa) == (1.0, 1.0, 0.0)


# ---------------------------------------------------------------------------
# stat_bartlett
# ---------------------------------------------------------------------------


def _bartlett_replay(orders: pd.DataFrame):
    groups: dict[str, list[int]] = {}
    for _, r in orders.iterrows():
        if pd.isna(r["o_totalprice"]):
            continue
        groups.setdefault(r["o_orderpriority"], []).append(
            math.floor(float(r["o_totalprice"]))
        )
    m = []
    for ys in groups.values():
        n_i = len(ys)
        if n_i < 2:
            continue
        s_i = sum(ys)
        ss_i = sum(y * y for y in ys)
        m.append((n_i, n_i * ss_i - s_i * s_i))
    k = len(m)
    n = sum(n_i for n_i, _ in m)
    if k < 2 or any(num == 0 for _, num in m) or n <= k:
        return k, n, 0.0, 0.0
    p_u = sum(_tdiv(num, n_i) for n_i, num in m)
    a_q = sum(
        math.floor(
            float(n_i - 1)
            * math.log(float(num) / (float(n_i) * float(n_i - 1)))
            * 1000000
        )
        for n_i, num in m
    )
    h_q = sum(_tdiv(10**12, n_i - 1) for n_i, _ in m)
    pooled = float(p_u) / float(n - k)
    x2 = (
        float(n - k) * math.log(float(p_u) / float(n - k))
        - float(a_q) / 1e6
    ) / (
        1.0
        + (float(h_q) / 1e12 - 1.0 / float(n - k)) / (3.0 * float(k - 1))
    )
    return k, n, pooled, x2


def test_bartlett_matches_python_model(spark):
    row = REGISTRY["stat_bartlett"].fn(spark, SF0001).collect()[0]
    k, n, pooled, x2 = _bartlett_replay(
        pd.read_parquet(f"{SF0001}/orders.parquet")
    )
    assert (row.k_groups, row.n_orders) == (k, n)
    assert row.pooled_var_dollars2 == pooled
    assert row.bartlett_x2 == x2


def test_bartlett_degenerates(spark, tmp_path):
    """A singleton group is excluded (no df); a zero-variance group
    pins X2 to 0; unequal spreads read a large X2."""
    prices = [100.0, 200.0, 300.0, 150.0, 250.0, 999.0]
    prios = ["1-URGENT"] * 3 + ["3-MEDIUM"] * 2 + ["5-LOW"]
    sf = _mk_sf(tmp_path, orders=_orders(prices, priorities=prios))
    assert check_query("stat_bartlett", spark, sf).ok
    row = REGISTRY["stat_bartlett"].fn(spark, sf).collect()[0]
    assert (row.k_groups, row.n_orders) == (2, 5)  # 5-LOW excluded
    assert row.bartlett_x2 != 0.0

    const = _orders([100.5] * 4 + [1.0, 2.0, 3.0],
                    priorities=["1-URGENT"] * 4 + ["3-MEDIUM"] * 3)
    sf2 = _mk_sf(tmp_path / "b", orders=const)
    assert check_query("stat_bartlett", spark, sf2).ok
    row2 = REGISTRY["stat_bartlett"].fn(spark, sf2).collect()[0]
    assert row2.bartlett_x2 == 0.0  # zero-variance group -> ln 0 pin
    # exactly-constant raw group: NOT a unit violation (true zero)
    assert row2.unit_contract_violated == 0

    # sub-dollar RAW spread: quantizes to zero variance -> the unit
    # tripwire announces the regime (the jarque_bera flag, extended)
    sub = _orders([100.1, 100.4, 100.8, 100.9] + [1.0, 2.0, 3.0],
                  priorities=["1-URGENT"] * 4 + ["3-MEDIUM"] * 3)
    sf4 = _mk_sf(tmp_path / "d", orders=sub)
    assert check_query("stat_bartlett", spark, sf4).ok
    row4 = REGISTRY["stat_bartlett"].fn(spark, sf4).collect()[0]
    assert row4.bartlett_x2 == 0.0
    assert row4.unit_contract_violated == 1

    one = _orders([7.0, 8.0], priorities=["1-URGENT"] * 2)
    sf3 = _mk_sf(tmp_path / "c", orders=one)
    assert check_query("stat_bartlett", spark, sf3).ok
    assert REGISTRY["stat_bartlett"].fn(spark, sf3).collect()[0].bartlett_x2 == 0.0


# ---------------------------------------------------------------------------
# stat_friedman_test
# ---------------------------------------------------------------------------


def _friedman_replay(cells: dict[tuple[str, int], int]):
    grps = sorted({g for g, _ in cells})
    dows = sorted({d for _, d in cells})
    k, b = len(grps), len(dows)
    d2 = {}
    for dow in dows:
        vals = [(cells.get((g, dow), 0), g) for g in grps]
        for v, g in vals:
            f = sum(1 for w, _ in vals if w < v)
            c = sum(1 for w, _ in vals if w == v)
            d2[(g, dow)] = 2 * (f + 1) + c - 1  # 2*RANK + ties - 1
    dj = {g: sum(d2[(g, d)] for d in dows) for g in grps}
    sum_dj2 = sum(v * v for v in dj.values())
    sum_d2 = sum(v * v for v in d2.values())
    den = sum_d2 - b * k * (k + 1) * (k + 1)
    if k < 2 or den == 0:
        return b, k, 0.0
    num = (k - 1) * (sum_dj2 - b * b * k * (k + 1) * (k + 1))
    return b, k, float(num) / float(den)


def _event_cells(sf=SF0001):
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev = ev.dropna(subset=["ts", "event_type"])
    dows = pd.to_datetime(ev["ts"]).dt.dayofweek + 1  # ISO
    return Counter(zip(ev["event_type"], dows))


def test_friedman_matches_python_model(spark):
    row = REGISTRY["stat_friedman_test"].fn(spark, SF0001).collect()[0]
    b, k, chi2 = _friedman_replay(dict(_event_cells()))
    assert (row.b_blocks, row.k_treatments) == (b, k)
    assert row.friedman_chi2 == chi2


def test_friedman_no_ties_reduces_to_classic(spark, tmp_path):
    """With distinct counts in every block, Conover's form must equal
    the classic 12/(bk(k+1)) sum(Rj^2) - 3b(k+1). The fixture uses
    IDENTICAL rank order in both blocks (unequal rank sums), whose
    statistic is known independently of any replay: perfect agreement
    with no ties gives chi2 = b(k-1) = 4.0 exactly — this is the
    non-circular pin that catches the r12 extra-b divisor bug (which
    read 2.0 here). The all-tied table pins 0."""
    rows = []
    eid = 0
    # 2 ISO-week days x 3 types, SAME rank order in both blocks:
    # view < click < purchase -> R = (2, 4, 6), sum Rj^2 = 56
    counts = {("view", 1): 1, ("click", 1): 2, ("purchase", 1): 4,
              ("view", 2): 2, ("click", 2): 3, ("purchase", 2): 5}
    base = {1: "2024-07-01", 2: "2024-07-02"}  # Mon, Tue
    for (etype, dow), c in counts.items():
        for _ in range(c):
            rows.append((f"e{eid}", f"{base[dow]} 03:00:00", "u0",
                         etype, 1.0))
            eid += 1
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_friedman_test", spark, sf).ok
    row = REGISTRY["stat_friedman_test"].fn(spark, sf).collect()[0]
    b, k, chi2 = _friedman_replay(counts)
    # classic formula on single (untied) ranks, hand-derived:
    # 12/24 * 56 - 24 = 4 = b(k-1), the perfect-agreement maximum
    ranks = {"view": 1 + 1, "click": 2 + 2, "purchase": 3 + 3}
    classic = (12.0 / (b * k * (k + 1))) * sum(
        r * r for r in ranks.values()
    ) - 3 * b * (k + 1)
    assert classic == 4.0 == b * (k - 1)  # independent pin, no replay
    assert abs(chi2 - classic) < 1e-12
    assert row.friedman_chi2 == chi2 == 4.0

    flat = []
    for d in (1, 2):
        for etype in ("view", "click"):
            for i in range(3):
                flat.append((f"f{d}{etype}{i}", f"{base[d]} 04:00:00",
                             "u0", etype, 1.0))
    sf2 = _mk_sf(tmp_path / "b", events=_events(flat))
    assert check_query("stat_friedman_test", spark, sf2).ok
    assert REGISTRY["stat_friedman_test"].fn(spark, sf2).collect()[0].friedman_chi2 == 0.0


def test_friedman_structural_zero_cells(spark, tmp_path):
    """A type absent on one weekday measures a true 0 in that block
    (the full-spine cross join), not a dropped cell."""
    rows = [
        ("a0", "2024-07-01 01:00:00", "u0", "view", 1.0),
        ("a1", "2024-07-01 01:00:00", "u0", "click", 1.0),
        ("a2", "2024-07-02 01:00:00", "u0", "view", 1.0),
        # click absent on Tuesday -> structural zero
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_friedman_test", spark, sf).ok
    row = REGISTRY["stat_friedman_test"].fn(spark, sf).collect()[0]
    cells = {("view", 1): 1, ("click", 1): 1, ("view", 2): 1}
    b, k, chi2 = _friedman_replay(cells)
    assert (row.b_blocks, row.k_treatments) == (2, 2)
    assert row.friedman_chi2 == chi2


# ---------------------------------------------------------------------------
# text_msttr
# ---------------------------------------------------------------------------


def _msttr_replay(texts, seg=50):
    n_tokens = 0
    types = set()
    seg_types = []
    docs_covered = set()
    for i, text in enumerate(texts):
        toks = [w for w in text.strip().lower().split(" ") if w != ""]
        n_tokens += len(toks)
        types.update(toks)
        for s in range(len(toks) // seg):
            chunk = toks[s * seg : (s + 1) * seg]
            seg_types.append(len(set(chunk)))
            docs_covered.add(i)
    g_ttr = 0.0 if n_tokens == 0 else float(len(types)) / float(n_tokens)
    ms = (
        0.0
        if not seg_types
        else float(sum(seg_types)) / (float(seg) * float(len(seg_types)))
    )
    return len(seg_types), len(docs_covered), n_tokens, g_ttr, ms


def test_msttr_matches_python_model(spark):
    row = REGISTRY["text_msttr"].fn(spark, SF0001).collect()[0]
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    n_seg, n_docs, n_tok, g_ttr, ms = _msttr_replay(docs["text"].tolist())
    assert (row.n_segments, row.n_docs_covered, row.n_tokens) == (
        n_seg, n_docs, n_tok,
    )
    assert row.global_ttr == g_ttr
    assert row.msttr_50 == ms


def test_msttr_segment_boundaries(spark, tmp_path):
    """49 tokens -> no segment; exactly 50 -> one; 149 -> two (the
    99-token tail truncates); whitespace-irregular tokens renumber
    identically on both engines; the all-repeat segment reads 1/50."""
    w = lambda n, p="w": " ".join(f"{p}{i}" for i in range(n))  # noqa: E731
    docs = _docs(
        [
            w(49),
            w(50, "x"),
            w(149, "y"),
            "  ".join(["dup"] * 50),  # doubled spaces + one type
        ]
    )
    sf = _mk_sf(tmp_path, documents=docs)
    assert check_query("text_msttr", spark, sf).ok
    row = REGISTRY["text_msttr"].fn(spark, sf).collect()[0]
    texts = docs["text"].tolist()
    n_seg, n_docs, n_tok, g_ttr, ms = _msttr_replay(texts)
    assert (n_seg, n_docs) == (4, 3)  # 0 + 1 + 2 + 1 segments
    assert (row.n_segments, row.n_docs_covered) == (n_seg, n_docs)
    assert row.msttr_50 == ms
    # the dup doc's segment contributes exactly 1 distinct type; the
    # three w/x/y segments are 50 distinct each
    assert ms == (50 + 50 + 50 + 1) / (50.0 * 4)


def test_msttr_empty_corpus(spark, tmp_path):
    sf = _mk_sf(tmp_path, documents=_docs(["", "   "]))
    assert check_query("text_msttr", spark, sf).ok
    row = REGISTRY["text_msttr"].fn(spark, sf).collect()[0]
    assert (row.n_segments, row.n_tokens, row.msttr_50) == (0, 0, 0.0)


# ---------------------------------------------------------------------------
# text_hapax_ratio
# ---------------------------------------------------------------------------


def test_hapax_matches_python_model(spark):
    row = REGISTRY["text_hapax_ratio"].fn(spark, SF0001).collect()[0]
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    wc = Counter(
        w
        for t in docs["text"]
        for w in t.strip().lower().split(" ")
        if w != ""
    )
    vocab, tokens = len(wc), sum(wc.values())
    h1 = sum(1 for c in wc.values() if c == 1)
    h2 = sum(1 for c in wc.values() if c == 2)
    assert (row.vocab, row.tokens, row.hapax, row.dis_legomena) == (
        vocab, tokens, h1, h2,
    )
    assert row.hapax_vocab_share == (0.0 if not vocab else h1 / vocab)


def test_hapax_crafted_distribution(spark, tmp_path):
    """once twice twice thrice thrice thrice -> vocab 3, hapax 1,
    dis 1; empty corpus pins every share to 0."""
    docs = _docs(["once twice thrice", "twice thrice", "thrice"])
    sf = _mk_sf(tmp_path, documents=docs)
    assert check_query("text_hapax_ratio", spark, sf).ok
    row = REGISTRY["text_hapax_ratio"].fn(spark, sf).collect()[0]
    assert (row.vocab, row.tokens, row.hapax, row.dis_legomena) == (3, 6, 1, 1)
    assert row.hapax_vocab_share == 1.0 / 3.0
    assert row.hapax_token_share == 1.0 / 6.0
    assert row.dis_vocab_share == 1.0 / 3.0

    sf2 = _mk_sf(tmp_path / "b", documents=_docs(["", " "]))
    assert check_query("text_hapax_ratio", spark, sf2).ok
    row2 = REGISTRY["text_hapax_ratio"].fn(spark, sf2).collect()[0]
    assert (row2.vocab, row2.hapax_vocab_share) == (0, 0.0)


# ---------------------------------------------------------------------------
# corpus_doclen_gini
# ---------------------------------------------------------------------------


def _gini_replay(xs):
    xs = sorted(xs)
    n = len(xs)
    s = sum(xs)
    if n == 0 or s == 0:
        return 0.0
    num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    return float(num) / (float(n) * float(s))


def test_doclen_gini_matches_python_model(spark):
    row = REGISTRY["corpus_doclen_gini"].fn(spark, SF0001).collect()[0]
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    xs = docs["n_chars"].dropna().astype(int).tolist()
    assert row.n_docs == len(xs)
    assert row.mean_chars == float(sum(xs)) / float(len(xs))
    assert abs(row.gini - _gini_replay(xs)) < 1e-12


def test_doclen_gini_degenerates(spark, tmp_path):
    """Equal lengths read G = 0 exactly; one giant doc among tiny ones
    reads G near (n-1)/n; zero-length corpus pins 0."""
    eq = _docs(["aaaa"] * 6)
    sf = _mk_sf(tmp_path, documents=eq)
    assert check_query("corpus_doclen_gini", spark, sf).ok
    assert REGISTRY["corpus_doclen_gini"].fn(spark, sf).collect()[0].gini == 0.0

    skew = _docs(["a"] * 9 + ["b" * 9991])
    sf2 = _mk_sf(tmp_path / "b", documents=skew)
    assert check_query("corpus_doclen_gini", spark, sf2).ok
    row2 = REGISTRY["corpus_doclen_gini"].fn(spark, sf2).collect()[0]
    assert abs(row2.gini - _gini_replay([1] * 9 + [9991])) < 1e-12
    assert row2.gini > 0.85

    empty = _docs(["", "", ""])
    sf3 = _mk_sf(tmp_path / "c", documents=empty)
    assert check_query("corpus_doclen_gini", spark, sf3).ok
    assert REGISTRY["corpus_doclen_gini"].fn(spark, sf3).collect()[0].gini == 0.0


# ---------------------------------------------------------------------------
# stat_wilcoxon_signed_rank
# ---------------------------------------------------------------------------


def _wilcoxon_replay(daily: dict[int, int]):
    diffs = [
        daily[d] - daily[d - 7]
        for d in sorted(daily)
        if d - 7 in daily and daily[d] != daily[d - 7]
    ]
    n = len(diffs)
    if n == 0:
        return 0, 0.0, 0.0, 0
    absd = sorted(abs(d) for d in diffs)
    ties = Counter(absd)
    d2 = {}
    for v in ties:
        f = sum(1 for w in absd if w < v)
        c = ties[v]
        d2[v] = 2 * (f + 1) + c - 1
    w2 = sum(d2[abs(d)] for d in diffs if d > 0)
    num2 = 2 * w2 - n * (n + 1)
    var48 = 2 * n * (n + 1) * (2 * n + 1) - sum(
        t * t * t - t for t in ties.values()
    )
    z = (
        0.0
        if var48 <= 0
        else (float(num2) / 4.0) / math.sqrt(float(var48) / 48.0)
    )
    flag = int(var48 > 0 and 3 * num2 * num2 * 10000 >= 38416 * var48)
    return n, w2 / 2.0, z, flag


def test_wilcoxon_matches_python_model(spark):
    row = REGISTRY["stat_wilcoxon_signed_rank"].fn(spark, SF0001).collect()[0]
    n, w_plus, z, flag = _wilcoxon_replay(_daily_event_counts())
    assert row.n_pairs == n
    assert row.w_plus == w_plus
    assert row.z_stat == z
    assert row.shift_5pct == flag
    assert n > 0  # the corpus spine spans > 1 week


def test_wilcoxon_shift_and_degenerates(spark, tmp_path):
    """Week 2 uniformly +5 over week 1 -> every diff positive, W+ is
    the full rank sum and the 5% flag fires at n = 7... (n = 7 pairs:
    z = 2.37); identical weeks -> zero diffs all drop, n = 0 pins z;
    a sub-8-day spine has no pairs."""
    rows = []
    eid = 0
    for d in range(1, 15):
        base = 3 + (d % 3)
        count = base + (5 if d > 7 else 0)
        for k in range(count):
            rows.append((f"e{eid}", f"2024-06-{d:02d} 01:00:00", "u0",
                         "view", 1.0))
            eid += 1
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_wilcoxon_signed_rank", spark, sf).ok
    row = REGISTRY["stat_wilcoxon_signed_rank"].fn(spark, sf).collect()[0]
    assert row.n_pairs == 7
    assert row.w_plus == 7 * 8 / 2 / 2 + 7 * 8 / 4  # all positive: W+ = n(n+1)/2
    assert row.shift_5pct == 1 and row.z_stat > 1.96

    flat = []
    for d in range(1, 15):
        for k in range(4):
            flat.append((f"f{d}x{k}", f"2024-06-{d:02d} 02:00:00", "u0",
                         "view", 1.0))
    sf2 = _mk_sf(tmp_path / "b", events=_events(flat))
    assert check_query("stat_wilcoxon_signed_rank", spark, sf2).ok
    row2 = REGISTRY["stat_wilcoxon_signed_rank"].fn(spark, sf2).collect()[0]
    assert (row2.n_pairs, row2.z_stat, row2.shift_5pct) == (0, 0.0, 0)

    short = [(f"s{d}", f"2024-06-{d:02d} 03:00:00", "u0", "view", 1.0)
             for d in range(1, 7)]
    sf3 = _mk_sf(tmp_path / "c", events=_events(short))
    assert check_query("stat_wilcoxon_signed_rank", spark, sf3).ok
    assert REGISTRY["stat_wilcoxon_signed_rank"].fn(spark, sf3).collect()[0].n_pairs == 0


# ---------------------------------------------------------------------------
# events_pot_tail
# ---------------------------------------------------------------------------


def _pot_replay(daily: dict[int, int]):
    xs = sorted((daily[d], d) for d in daily)
    n = len(xs)
    if n == 0:
        return 0, 0, 0, 0, 0.0, 0.0
    k = (9 * n) // 10 + (0 if (9 * n) % 10 == 0 else 1)
    u = xs[k - 1][0]
    exc = [x - u for x, _ in xs if x > u]
    ne = len(exc)
    return (
        n, u, ne, max(exc) if exc else 0,
        float(ne) / float(n),
        0.0 if ne == 0 else float(sum(exc)) / float(ne),
    )


def test_pot_matches_python_model(spark):
    row = REGISTRY["events_pot_tail"].fn(spark, SF0001).collect()[0]
    n, u, ne, mx, rate, mean_e = _pot_replay(_daily_event_counts())
    assert (row.n_days, row.threshold_p90, row.n_exceed, row.max_excess) == (
        n, u, ne, mx,
    )
    assert row.exceed_rate == rate
    assert row.mean_excess == mean_e


def test_pot_constant_and_spike(spark, tmp_path):
    """A constant series reads u = x and 0 exceedances (strict >); one
    spike day reads exactly that excess; the replay pins the exact
    ceil-rank threshold on a 10-day spine (k = 9)."""
    flat = [(f"e{d}x{k}", f"2024-06-{d:02d} 01:00:00", "u0", "view", 1.0)
            for d in range(1, 11) for k in range(4)]
    sf = _mk_sf(tmp_path, events=_events(flat))
    assert check_query("events_pot_tail", spark, sf).ok
    row = REGISTRY["events_pot_tail"].fn(spark, sf).collect()[0]
    assert (row.threshold_p90, row.n_exceed, row.mean_excess) == (4, 0, 0.0)

    spike = list(flat)
    spike += [(f"s{k}", "2024-06-05 02:00:00", "u1", "view", 1.0)
              for k in range(6)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(spike))
    assert check_query("events_pot_tail", spark, sf2).ok
    row2 = REGISTRY["events_pot_tail"].fn(spark, sf2).collect()[0]
    n, u, ne, mx, rate, mean_e = _pot_replay(
        {d: (10 if d == 5 else 4) for d in range(1, 11)}
    )
    assert (row2.threshold_p90, row2.n_exceed, row2.max_excess) == (u, ne, mx)
    assert row2.mean_excess == mean_e


# ---------------------------------------------------------------------------
# ml_pauc_fpr10
# ---------------------------------------------------------------------------


def _pauc_replay(scores):
    """scores: list of (value, is_pos). Exact trapezoid pAUC at
    FPR <= 0.1 with the query's femto-quantization."""
    byv: dict[float, list[int]] = {}
    for v, pos in scores:
        c = byv.setdefault(v, [0, 0])
        c[0] += pos
        c[1] += 1 - pos
    p = sum(c1 for c1, _ in byv.values())
    total = sum(c1 + c2 for c1, c2 in byv.values())
    nneg = total - p
    if p == 0 or nneg == 0:
        return p, nneg, len(byv), 0.0, 0.0
    pauc_q = 0
    p_above = f_above = 0
    for v in sorted(byv, reverse=True):
        c1, c2 = byv[v]
        if c2 > 0:
            lam = min(1.0, max(0.0, (nneg / 10.0 - f_above) / c2))
            area = (lam * c2 / nneg) * ((p_above + lam * c1 / 2.0) / p)
            pauc_q += math.floor(area * 1e15)
        p_above += c1
        f_above += c2
    pauc = pauc_q / 1e15
    std = 0.5 * (1.0 + (pauc - 0.005) / 0.095)
    return p, nneg, len(byv), pauc, std


def test_pauc_matches_python_model(spark):
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev.dropna(subset=["value"])
    scores = [
        (float(v), int(t == "purchase"))
        for v, t in zip(ev["value"], ev["event_type"])
    ]
    p, nneg, nt, pauc, std = _pauc_replay(scores)
    row = REGISTRY["ml_pauc_fpr10"].fn(spark, SF0001).collect()[0]
    assert (row.n_pos, row.n_neg, row.n_thresholds) == (p, nneg, nt)
    assert row.pauc_fpr10 == pauc
    assert row.pauc_std == std


def test_pauc_perfect_and_random_separation(spark, tmp_path):
    """A perfect separator reads pauc = c (0.1) and pauc_std = 1.0; a
    worst-case separator (all positives below) reads ~0; one-class
    corpora pin 0."""
    rows = [(f"p{i}", "2024-01-01 01:00:00", f"u{i}", "purchase",
             1000.0 + i) for i in range(20)]
    rows += [(f"n{i}", "2024-01-01 02:00:00", f"v{i}", "view", float(i))
             for i in range(100)]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("ml_pauc_fpr10", spark, sf).ok
    row = REGISTRY["ml_pauc_fpr10"].fn(spark, sf).collect()[0]
    assert abs(row.pauc_fpr10 - 0.1) < 1e-12
    assert abs(row.pauc_std - 1.0) < 1e-12

    inv = [(f"p{i}", "2024-01-01 01:00:00", f"u{i}", "purchase", float(i))
           for i in range(20)]
    inv += [(f"n{i}", "2024-01-01 02:00:00", f"v{i}", "view",
             1000.0 + i) for i in range(100)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(inv))
    assert check_query("ml_pauc_fpr10", spark, sf2).ok
    row2 = REGISTRY["ml_pauc_fpr10"].fn(spark, sf2).collect()[0]
    assert row2.pauc_fpr10 == 0.0

    onec = [(f"p{i}", "2024-01-01 01:00:00", f"u{i}", "purchase", float(i))
            for i in range(5)]
    sf3 = _mk_sf(tmp_path / "c", events=_events(onec))
    assert check_query("ml_pauc_fpr10", spark, sf3).ok
    row3 = REGISTRY["ml_pauc_fpr10"].fn(spark, sf3).collect()[0]
    assert (row3.pauc_fpr10, row3.pauc_std) == (0.0, 0.0)
