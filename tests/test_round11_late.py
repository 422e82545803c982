"""Round-11 LATE-batch additions (queued for the r12 driver window):
python-model replays on the real sf0.001 corpus plus crafted
degenerate differentials for the 12 new operators —

  ml_mcc_confusion, ml_brier_decomposition, stat_jarque_bera,
  stat_theil_u, stat_runs_test, stat_pettitt_change,
  stat_kendall_tau_daily, events_forecast_eval, stat_levene_bf,
  embeddings_silhouette, corpus_ngram_contamination,
  text_rake_keywords.

Each replay reproduces the registered query's EXACT arithmetic
(integer quantization, FLOOR sites, fixed IEEE chains) in plain
python/numpy; each differential runs the full Spark-vs-DuckDB hash
comparison on inputs the synthetic corpus never produces."""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
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


def _orders(prices, priorities=None, dates=None):
    n = len(prices)
    return pd.DataFrame(
        {
            "o_orderkey": pd.array(range(1, n + 1), dtype="int64"),
            "o_custkey": pd.array([i % 7 for i in range(n)], dtype="int64"),
            "o_orderstatus": pd.array(["F"] * n, dtype="object"),
            "o_totalprice": pd.array(prices, dtype="float64"),
            # micros, not pandas' default nanos: TIMESTAMP(NANOS)
            # parquet reaches Spark as a raw long under nanosAsLong
            # (the registry only normalizes the events `ts` column)
            "o_orderdate": pd.to_datetime(
                dates if dates is not None else ["1997-01-15"] * n
            ).astype("datetime64[us]"),
            "o_orderpriority": pd.array(
                priorities if priorities is not None else ["3-MEDIUM"] * n,
                dtype="object",
            ),
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


def _docs(texts, ids=None):
    n = len(texts)
    ids = ids if ids is not None else list(range(1, n + 1))
    return pd.DataFrame(
        {
            "doc_id": pd.array(ids, dtype="int64"),
            "text": pd.array(texts, dtype="object"),
            "lang": pd.array(["en"] * n, dtype="object"),
            "source": pd.array(["src0"] * n, dtype="object"),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )


def _embs(vecs, labels):
    return pd.DataFrame(
        {
            "vec_id": pd.array(range(1, len(vecs) + 1), dtype="int64"),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": pd.array(labels, dtype="int32"),
        }
    )


def _f(x) -> float:
    return float(x)


def _coin(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:4], 16)


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark DIV == DuckDB //,
    both truncate; python // floors)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ---------------------------------------------------------------------------
# ml_mcc_confusion
# ---------------------------------------------------------------------------


def test_mcc_matches_python_model(spark):
    row = REGISTRY["ml_mcc_confusion"].fn(spark, SF0001).collect()[0]
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    y = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    flip = o["o_orderkey"].map(lambda k: int(_coin(f"mcc#{k}") < 9830))
    yhat = (y - flip).abs()
    tp = int(((y == 1) & (yhat == 1)).sum())
    fp = int(((y == 0) & (yhat == 1)).sum())
    fn = int(((y == 1) & (yhat == 0)).sum())
    tn = int(((y == 0) & (yhat == 0)).sum())
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    assert row.precision_ == _f(tp) / _f(tp + fp)
    assert row.recall_ == _f(tp) / _f(tp + fn)
    assert row.f1 == _f(2 * tp) / _f(2 * tp + fp + fn)
    mcc = _f(tp * tn - fp * fn) / (
        math.sqrt(_f(tp + fp))
        * math.sqrt(_f(tp + fn))
        * math.sqrt(_f(tn + fp))
        * math.sqrt(_f(tn + fn))
    )
    assert row.mcc == mcc


def test_mcc_degenerate_single_class(spark, tmp_path):
    """All labels positive: TN+FP margin is 0 so MCC pins to 0; the
    remaining rates stay finite. Hash-exact on both engines."""
    sf = _mk_sf(
        tmp_path, orders=_orders([10.0] * 9, priorities=["1-URGENT"] * 9)
    )
    r = check_query("ml_mcc_confusion", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["ml_mcc_confusion"].fn(spark, sf).collect()[0]
    assert row.mcc == 0.0 and row.fp == 0 and row.tn == 0
    assert row.tp + row.fn == 9


# ---------------------------------------------------------------------------
# ml_brier_decomposition
# ---------------------------------------------------------------------------


def _brier_replay(df: pd.DataFrame):
    y = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    coin = df["o_orderkey"].map(lambda k: _coin(f"cal#{k}"))
    n = len(df)
    bq = int(((coin - 65536 * y) ** 2).sum())
    brier = _f(bq) / (_f(n) * _f(65536) * _f(65536))
    bins = pd.DataFrame({"bin": coin * 10 // 65536, "y": y, "coin": coin})
    g = bins.groupby("bin").agg(
        n_k=("y", "size"), pos_k=("y", "sum"), sc_k=("coin", "sum")
    )
    pos = int(y.sum())
    ybar = _f(pos) / _f(n)
    rel_q = res_q = 0
    for _, r in g.iterrows():
        pbar = _f(int(r.sc_k)) / (_f(int(r.n_k)) * _f(65536))
        ybk = _f(int(r.pos_k)) / _f(int(r.n_k))
        rel_q += math.floor(_f(int(r.n_k)) * (pbar - ybk) * (pbar - ybk) * 1e9)
        res_q += math.floor(_f(int(r.n_k)) * (ybk - ybar) * (ybk - ybar) * 1e9)
    return n, pos, brier, (rel_q / 1e9) / n, (res_q / 1e9) / n, ybar * (1 - ybar)


def test_brier_matches_python_model(spark):
    row = REGISTRY["ml_brier_decomposition"].fn(spark, SF0001).collect()[0]
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    n, pos, brier, rel, res, unc = _brier_replay(o)
    assert (row.n_orders, row.n_pos) == (n, pos)
    assert row.brier == brier
    assert row.reliability == rel
    assert row.resolution == res
    assert row.uncertainty == unc


def test_brier_all_positive_and_empty(spark, tmp_path):
    """All-positive labels: uncertainty = 0 and brier = mean (1-p)^2;
    an all-NULL-price table still has rows (the coin ignores price) —
    instead make the table EMPTY to drive the staged scalar to the
    typed NULL and a 0-row output on both engines."""
    sf = _mk_sf(
        tmp_path, orders=_orders([5.0] * 6, priorities=["2-HIGH"] * 6)
    )
    r = check_query("ml_brier_decomposition", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["ml_brier_decomposition"].fn(spark, sf).collect()[0]
    assert row.uncertainty == 0.0 and row.n_pos == 6
    empty = _orders([])
    sf2 = _mk_sf(tmp_path / "b", orders=empty)
    r2 = check_query("ml_brier_decomposition", spark, sf2)
    assert r2.ok, str(r2)
    assert REGISTRY["ml_brier_decomposition"].fn(spark, sf2).count() == 0


# ---------------------------------------------------------------------------
# stat_jarque_bera
# ---------------------------------------------------------------------------


def _jb_replay(prices):
    y = [math.floor(p) for p in prices if p is not None]
    n = len(y)
    s1 = sum(y)
    m0 = _tdiv(s1, n) if n else 0
    d = [v - m0 for v in y]
    r = sum(d)
    sd2 = sum(v * v for v in d)
    sd3 = sum(v * v * v for v in d)
    sd4 = sum(v * v * v * v for v in d)
    dele = _f(r) / _f(n)
    e2, e3, e4 = _f(sd2) / _f(n), _f(sd3) / _f(n), _f(sd4) / _f(n)
    c2 = e2 - dele * dele
    c3 = e3 - 3.0 * dele * e2 + 2.0 * dele * dele * dele
    c4 = (
        e4
        - 4.0 * dele * e3
        + 6.0 * dele * dele * e2
        - 3.0 * dele * dele * dele * dele
    )
    if n < 2 or min(y) == max(y):
        return n, 0.0, 0.0, 0.0
    skew = c3 / (c2 * math.sqrt(c2))
    exk = c4 / (c2 * c2) - 3.0
    jb = _f(n) / 6.0 * (skew * skew + exk * exk / 4.0)
    return n, skew, exk, jb


def test_jarque_bera_matches_python_model(spark):
    row = REGISTRY["stat_jarque_bera"].fn(spark, SF0001).collect()[0]
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    n, skew, exk, jb = _jb_replay(o["o_totalprice"].dropna().tolist())
    assert row.n_orders == n
    assert row.skewness == skew
    assert row.ex_kurtosis == exk
    assert row.jb_stat == jb


def test_jarque_bera_degenerates(spark, tmp_path):
    """Constant column and n=1 pin everything to 0; a skewed 3-point
    set matches the replay bit-for-bit; negative dollar totals keep
    the truncating anchor identical on both engines."""
    sf = _mk_sf(tmp_path, orders=_orders([42.5, 42.9, 42.0]))
    assert check_query("stat_jarque_bera", spark, sf).ok
    row = REGISTRY["stat_jarque_bera"].fn(spark, sf).collect()[0]
    assert row.skewness == 0.0 and row.jb_stat == 0.0  # all floor to 42
    sf2 = _mk_sf(tmp_path / "b", orders=_orders([7.0]))
    assert check_query("stat_jarque_bera", spark, sf2).ok
    prices = [-100.5, -3.25, -998.0, -1.5, -40.0]
    sf3 = _mk_sf(tmp_path / "c", orders=_orders(prices))
    r3 = check_query("stat_jarque_bera", spark, sf3)
    assert r3.ok, str(r3)
    row3 = REGISTRY["stat_jarque_bera"].fn(spark, sf3).collect()[0]
    _, skew, exk, jb = _jb_replay(prices)
    assert (row3.skewness, row3.ex_kurtosis, row3.jb_stat) == (skew, exk, jb)


# ---------------------------------------------------------------------------
# stat_theil_u
# ---------------------------------------------------------------------------


def test_theil_u_matches_python_model(spark):
    row = REGISTRY["stat_theil_u"].fn(spark, SF0001).collect()[0]
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["ts"].notna() & ev["event_type"].notna()]
    dow = pd.to_datetime(ev["ts"]).dt.isocalendar().day.astype(int)
    ct = pd.crosstab(ev["event_type"], dow)
    n = int(ct.values.sum())
    qy = sum(
        math.floor(_f(rm) * math.log(_f(rm)) * 1e6)
        for rm in ct.sum(axis=1).astype(int)
    )
    qc = 0
    for dj in ct.columns:
        cmv = int(ct[dj].sum())
        for gi in ct.index:
            c = int(ct.loc[gi, dj])
            if c > 0:
                qc += math.floor(_f(c) * math.log(_f(cmv) / _f(c)) * 1e6)
    h_y = math.log(_f(n)) - (qy / 1e6) / n
    h_yx = (qc / 1e6) / n
    assert (row.n_events, row.n_types, row.n_dows) == (n, *ct.shape)
    assert row.h_y == h_y
    assert row.h_y_given_x == h_yx
    assert row.theil_u == (h_y - h_yx) / h_y


def test_theil_u_degenerates(spark, tmp_path):
    """Single event_type pins U to 0; perfect association (each type
    owns one weekday) reads U = 1 up to the micro-quantization."""
    rows = [
        (i, f"2024-01-{15 + (i % 3)} 01:00:00", i, "only", 1.0)
        for i in range(1, 10)
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_theil_u", spark, sf).ok
    assert REGISTRY["stat_theil_u"].fn(spark, sf).collect()[0].theil_u == 0.0
    rows2 = [(i, "2024-01-15 01:00:00", i, "tA", 1.0) for i in range(1, 5)]
    rows2 += [(i + 10, "2024-01-16 01:00:00", i, "tB", 1.0) for i in range(1, 5)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(rows2))
    assert check_query("stat_theil_u", spark, sf2).ok
    u = REGISTRY["stat_theil_u"].fn(spark, sf2).collect()[0].theil_u
    assert abs(u - 1.0) < 1e-5


# ---------------------------------------------------------------------------
# stat_runs_test
# ---------------------------------------------------------------------------


def _daily_counts(ev: pd.DataFrame) -> dict[int, int]:
    ts = pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
    dn = (ts.astype("int64") // 10**9 // 86400).astype(int)
    return dn.value_counts().sort_index().to_dict()


def _runs_replay(daily: dict[int, int]):
    xs = sorted(daily.values())
    nd = len(xs)
    lo, hi = _tdiv(nd + 1, 2), _tdiv(nd + 2, 2)
    med2 = xs[lo - 1] + xs[hi - 1] if nd else 0
    seq = [
        1 if 2 * daily[d] > med2 else 0
        for d in sorted(daily)
        if 2 * daily[d] != med2
    ]
    n_used, n1 = len(seq), sum(seq)
    n2 = n_used - n1
    runs = sum(
        1 for i, s in enumerate(seq) if i == 0 or seq[i - 1] != s
    )
    if 2 * n1 * n2 * (2 * n1 * n2 - n_used) <= 0:
        z = 0.0
    else:
        mu = _f(2 * n1 * n2) / _f(n_used) + 1.0
        var = (
            _f(2 * n1 * n2)
            * (_f(2 * n1 * n2) - _f(n_used))
            / (_f(n_used) * _f(n_used) * _f(n_used - 1))
        )
        z = (_f(runs) - mu) / math.sqrt(var)
    return nd, n_used, n1, n2, runs, z


def test_runs_test_matches_python_model(spark):
    row = REGISTRY["stat_runs_test"].fn(spark, SF0001).collect()[0]
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    nd, n_used, n1, n2, runs, z = _runs_replay(_daily_counts(ev))
    assert (row.n_days, row.n_used) == (nd, n_used)
    assert (row.n_above, row.n_below, row.n_runs) == (n1, n2, runs)
    assert row.z_stat == z


def test_runs_test_degenerates(spark, tmp_path):
    """Constant daily volume: every day sits AT the doubled median and
    is excluded — n_used = 0, z = 0. A strictly increasing series has
    exactly 2 runs. Both hash-exact."""
    rows, rid = [], 1
    for d in range(10, 14):
        for _ in range(3):
            rows.append((rid, f"2024-01-{d} 0{rid % 9}:00:00", rid, "view", 1.0))
            rid += 1
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_runs_test", spark, sf).ok
    r = REGISTRY["stat_runs_test"].fn(spark, sf).collect()[0]
    assert r.n_used == 0 and r.z_stat == 0.0
    rows2, rid = [], 1
    for i, d in enumerate(range(10, 16)):
        for _ in range(i + 1):  # 1,2,3,4,5,6 events/day
            rows2.append((rid, f"2024-01-{d} 0{rid % 9}:00:00", rid, "view", 1.0))
            rid += 1
    sf2 = _mk_sf(tmp_path / "b", events=_events(rows2))
    assert check_query("stat_runs_test", spark, sf2).ok
    r2 = REGISTRY["stat_runs_test"].fn(spark, sf2).collect()[0]
    assert r2.n_runs == 2  # below-median block then above-median block


# ---------------------------------------------------------------------------
# stat_pettitt_change
# ---------------------------------------------------------------------------


def _pettitt_replay(daily: dict[int, int]):
    days = sorted(daily)
    nd = len(days)
    xs = [daily[d] for d in days]
    r2 = []
    for x in xs:
        less = sum(1 for v in xs if v < x)
        eq = sum(1 for v in xs if v == x)
        r2.append(2 * less + eq + 1)
    order = sorted(range(nd), key=lambda i: days[i])
    w2, best_k, best_dn = 0, None, None
    for t, i in enumerate(order, start=1):
        w2 += r2[i]
        if t < nd:
            u = w2 - t * (nd + 1)
            if best_k is None or abs(u) > best_k or (
                abs(u) == best_k and days[i] < best_dn
            ):
                if best_k is None or abs(u) > best_k:
                    best_k, best_dn = abs(u), days[i]
    sig = int(
        6.0 * _f(best_k) * _f(best_k)
        > 3.6888794541139363 * (_f(nd) ** 3 + _f(nd) ** 2)
    )
    return nd, best_k, best_dn, sig


def test_pettitt_matches_python_model(spark):
    row = REGISTRY["stat_pettitt_change"].fn(spark, SF0001).collect()[0]
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    nd, k, dn, sig = _pettitt_replay(_daily_counts(ev))
    assert row.n_days == nd
    assert row.k_stat == k
    assert row.change_dn == dn
    assert row.significant_05 == sig


def test_pettitt_level_shift_flags(spark, tmp_path):
    """A clean level shift (1/day for 12 days then 9/day for 12 days)
    puts the argmax at the last low day and flags significance; a
    constant series reads K = 0 with no flag."""
    rows, rid = [], 1
    for d in range(1, 13):
        rows.append((rid, f"2024-01-{d:02d} 01:00:00", rid, "view", 1.0))
        rid += 1
    for d in range(13, 25):
        for h in range(9):
            rows.append((rid, f"2024-01-{d:02d} {10 + h}:00:00", rid, "view", 1.0))
            rid += 1
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_pettitt_change", spark, sf).ok
    r = REGISTRY["stat_pettitt_change"].fn(spark, sf).collect()[0]
    jan12 = int(pd.Timestamp("2024-01-12").timestamp()) // 86400
    assert r.change_dn == jan12 and r.significant_05 == 1
    const = [
        (i, f"2024-01-{d:02d} 01:00:00", i, "view", 1.0)
        for i, d in enumerate(range(1, 7), start=1)
    ]
    sf2 = _mk_sf(tmp_path / "b", events=_events(const))
    assert check_query("stat_pettitt_change", spark, sf2).ok
    r2 = REGISTRY["stat_pettitt_change"].fn(spark, sf2).collect()[0]
    assert r2.k_stat == 0 and r2.significant_05 == 0


# ---------------------------------------------------------------------------
# stat_kendall_tau_daily
# ---------------------------------------------------------------------------


def test_kendall_matches_python_model(spark):
    row = REGISTRY["stat_kendall_tau_daily"].fn(spark, SF0001).collect()[0]
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    ts = pd.to_datetime(o["o_orderdate"]).astype("datetime64[ns]")
    dn = (ts.astype("int64") // 10**9 // 86400).astype(int)
    cents = np.floor(o["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(
        np.int64
    )
    g = pd.DataFrame({"dn": dn, "c": 1, "v": cents}).groupby("dn").agg(
        c=("c", "size"), v=("v", "sum")
    )
    pts = list(zip(g["c"].astype(int), g["v"].astype(int)))
    nd = len(pts)
    conc = disc = 0
    for i in range(nd):
        for j in range(i + 1, nd):
            (ac, av), (bc, bv) = pts[i], pts[j]
            if (ac > bc and av > bv) or (ac < bc and av < bv):
                conc += 1
            elif (ac > bc and av < bv) or (ac < bc and av > bv):
                disc += 1
    from collections import Counter

    tx = sum(t * (t - 1) // 2 for t in Counter(c for c, _ in pts).values())
    ty = sum(t * (t - 1) // 2 for t in Counter(v for _, v in pts).values())
    n0 = nd * (nd - 1) // 2
    tau = _f(conc - disc) / (math.sqrt(_f(n0 - tx)) * math.sqrt(_f(n0 - ty)))
    assert (row.n_days, row.concordant, row.discordant) == (nd, conc, disc)
    assert (row.ties_x, row.ties_y) == (tx, ty)
    assert row.tau_b == tau


def test_kendall_degenerates(spark, tmp_path):
    """Perfectly monotone daily (count, revenue) reads tau = 1; an
    all-tied count margin pins tau to 0 in integer space."""
    prices, dates = [], []
    for i, d in enumerate(range(10, 15), start=1):
        for _ in range(i):  # day d has i orders of 100*i dollars
            prices.append(100.0 * i)
            dates.append(f"1997-02-{d:02d}")
    sf = _mk_sf(tmp_path, orders=_orders(prices, dates=dates))
    assert check_query("stat_kendall_tau_daily", spark, sf).ok
    # tau = 10/(sqrt(10)*sqrt(10)) — 1.0 only up to the IEEE chain
    expect = _f(10) / (math.sqrt(10.0) * math.sqrt(10.0))
    assert REGISTRY["stat_kendall_tau_daily"].fn(spark, sf).collect()[0].tau_b == expect
    # one order per day at distinct prices: counts all tied -> tau 0
    sf2 = _mk_sf(
        tmp_path / "b",
        orders=_orders(
            [10.0, 30.0, 20.0, 50.0],
            dates=["1997-02-10", "1997-02-11", "1997-02-12", "1997-02-13"],
        ),
    )
    assert check_query("stat_kendall_tau_daily", spark, sf2).ok
    assert REGISTRY["stat_kendall_tau_daily"].fn(spark, sf2).collect()[0].tau_b == 0.0


# ---------------------------------------------------------------------------
# events_forecast_eval
# ---------------------------------------------------------------------------


def test_forecast_eval_matches_python_model(spark):
    rows = {
        r.model: r
        for r in REGISTRY["events_forecast_eval"].fn(spark, SF0001).collect()
    }
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    daily = _daily_counts(ev)
    for model, lag in (("naive_1", 1), ("snaive_7", 7)):
        pairs = [(daily[d], daily[d - lag]) for d in daily if d - lag in daily]
        n = len(pairs)
        sae = sum(abs(x - f) for x, f in pairs)
        sy = sum(x for x, _ in pairs)
        smape_q = sum(
            math.floor(2.0 * _f(abs(x - f)) / _f(x + f) * 1e9) for x, f in pairs
        )
        r = rows[model]
        assert r.n_days == n
        assert r.mae == _f(sae) / _f(n)
        assert r.wape == _f(sae) / _f(sy)
        assert r.smape == (smape_q / 1e9) / n


def test_forecast_eval_degenerates(spark, tmp_path):
    """Perfect weekly seasonality scores snaive_7 at exactly 0 on all
    three metrics while naive_1 stays positive; a single-day corpus
    produces no scorable pairs (0 rows) on both engines."""
    rows, rid = [], 1
    for d in range(1, 22):  # 3 weeks, volume = weekday index + 1
        wd = (d - 1) % 7 + 1
        for _ in range(wd):
            rows.append((rid, f"2024-01-{d:02d} 0{rid % 9}:00:00", rid, "view", 1.0))
            rid += 1
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("events_forecast_eval", spark, sf).ok
    out = {r.model: r for r in REGISTRY["events_forecast_eval"].fn(spark, sf).collect()}
    assert out["snaive_7"].mae == 0.0 and out["snaive_7"].smape == 0.0
    assert out["naive_1"].mae > 0.0
    one = [(1, "2024-01-15 01:00:00", 1, "view", 1.0)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(one))
    assert check_query("events_forecast_eval", spark, sf2).ok
    assert REGISTRY["events_forecast_eval"].fn(spark, sf2).count() == 0


# ---------------------------------------------------------------------------
# stat_levene_bf
# ---------------------------------------------------------------------------


def _levene_replay(groups: dict[str, list[int]]):
    med2 = {}
    for g, ys in groups.items():
        xs = sorted(ys)
        nd = len(xs)
        med2[g] = xs[_tdiv(nd + 1, 2) - 1] + xs[_tdiv(nd + 2, 2) - 1]
    m = {}
    for g, ys in groups.items():
        z = [abs(2 * y - med2[g]) for y in ys]
        m[g] = (len(z), sum(z), sum(v * v for v in z), min(z), max(z))
    k = len(m)
    n = sum(v[0] for v in m.values())
    s = sum(v[1] for v in m.values())
    ssq_milli = sum(v[2] for v in m.values()) * 1000
    bq_milli = sum(
        math.floor(_f(v[1] * v[1]) / _f(v[0]) * 1000) for v in m.values()
    )
    ssb = max(bq_milli - math.floor(_f(s * s) / _f(n) * 1000), 0)
    ssw = ssq_milli - bq_milli
    if k <= 1 or n <= k or ssw <= 0:
        w = 0.0
    else:
        w = (_f(ssb) / _f(k - 1)) / (_f(ssw) / _f(n - k))
    return {
        g: (v[0], _f(med2[g]) / 200.0, _f(v[1]) / _f(v[0]) / 200.0, w)
        for g, v in m.items()
    }


def test_levene_matches_python_model(spark):
    out = {
        r.event_type: r
        for r in REGISTRY["stat_levene_bf"].fn(spark, SF0001).collect()
    }
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["value"].notna() & ev["event_type"].notna()]
    groups = {
        g: [int(math.floor(v * 100)) for v in sub["value"]]
        for g, sub in ev.groupby("event_type")
    }
    expect = _levene_replay(groups)
    assert set(out) == set(expect)
    for g, (n_i, med, mad, w) in expect.items():
        r = out[g]
        assert r.n_i == n_i
        assert r.group_median == med
        assert r.mean_absdev == mad
        assert r.w_stat == w


def test_levene_degenerates(spark, tmp_path):
    """Every |deviation| identical across groups (symmetric pairs at
    the same spread): ssw = 0 pins W to 0. One constant group beside
    one spread group produces a finite positive W. Both hash-exact."""
    rows = [
        (1, "2024-01-05 01:00:00", 1, "a", 1.0),
        (2, "2024-01-05 02:00:00", 2, "a", 3.0),
        (3, "2024-01-05 03:00:00", 3, "b", 10.0),
        (4, "2024-01-05 04:00:00", 4, "b", 12.0),
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_levene_bf", spark, sf).ok
    out = REGISTRY["stat_levene_bf"].fn(spark, sf).collect()
    assert all(r.w_stat == 0.0 for r in out)  # |z| = 100 cents everywhere
    rows2 = [
        (1, "2024-01-05 01:00:00", 1, "flat", 5.0),
        (2, "2024-01-05 02:00:00", 2, "flat", 5.0),
        (3, "2024-01-05 03:00:00", 3, "flat", 5.0),
        (4, "2024-01-05 04:00:00", 4, "wide", 1.0),
        (5, "2024-01-05 05:00:00", 5, "wide", 9.0),
        (6, "2024-01-05 06:00:00", 6, "wide", 5.0),
    ]
    sf2 = _mk_sf(tmp_path / "b", events=_events(rows2))
    assert check_query("stat_levene_bf", spark, sf2).ok
    out2 = {r.event_type: r for r in REGISTRY["stat_levene_bf"].fn(spark, sf2).collect()}
    assert out2["wide"].w_stat > 0.0


# ---------------------------------------------------------------------------
# embeddings_silhouette
# ---------------------------------------------------------------------------


def _silhouette_replay(vecs, labels):
    q = [[math.floor(float(x) * 1e6) for x in v] for v in vecs]
    dims = len(q[0])
    by_label: dict[int, list[int]] = {}
    for i, lab in enumerate(labels):
        by_label.setdefault(lab, []).append(i)
    cent = {
        lab: (
            [sum(q[i][d] for i in idx) for d in range(dims)],
            len(idx),
        )
        for lab, idx in by_label.items()
    }
    sums: dict[int, list[int]] = {}
    for i, lab in enumerate(labels):
        dists = {}
        for cl, (s, cnt) in cent.items():
            num = sum((q[i][d] * cnt - s[d]) ** 2 for d in range(dims))
            dists[cl] = math.sqrt(_f(num)) / _f(cnt)
        a = dists[lab]
        others = [v for cl, v in dists.items() if cl != lab]
        if not others or max(a, min(others)) == 0.0:
            s_q = 0
        else:
            b = min(others)
            s_q = math.floor((b - a) / max(a, b) * 1e9)
        sums.setdefault(lab, []).append(s_q)
    return {
        lab: (len(v), (sum(v) / 1e9) / len(v)) for lab, v in sums.items()
    }


def test_silhouette_matches_numpy_model(spark):
    out = {
        r.label: r
        for r in REGISTRY["embeddings_silhouette"].fn(spark, SF0001).collect()
    }
    e = pd.read_parquet(f"{SF0001}/embeddings.parquet")
    expect = _silhouette_replay(
        [list(v) for v in e["embedding"]], e["label"].astype(int).tolist()
    )
    assert set(out) == set(expect)
    for lab, (n, mean_s) in expect.items():
        assert out[lab].n_vecs == n
        assert out[lab].mean_silhouette == mean_s


def test_silhouette_degenerates(spark, tmp_path):
    """A single label (b undefined) pins every score to 0; two tight,
    well-separated labels read means near +1. Both hash-exact."""
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.8, 0.2]]
    sf = _mk_sf(tmp_path, embeddings=_embs(vecs, [3, 3, 3]))
    assert check_query("embeddings_silhouette", spark, sf).ok
    out = REGISTRY["embeddings_silhouette"].fn(spark, sf).collect()
    assert len(out) == 1 and out[0].mean_silhouette == 0.0
    vecs2 = [[1.0, 0.0], [1.0, 0.01], [0.0, 1.0], [0.01, 1.0]]
    sf2 = _mk_sf(tmp_path / "b", embeddings=_embs(vecs2, [0, 0, 1, 1]))
    assert check_query("embeddings_silhouette", spark, sf2).ok
    out2 = REGISTRY["embeddings_silhouette"].fn(spark, sf2).collect()
    assert all(r.mean_silhouette > 0.9 for r in out2)


# ---------------------------------------------------------------------------
# corpus_ngram_contamination
# ---------------------------------------------------------------------------


def _split_of(doc_id: int) -> str:
    b = _coin(str(doc_id))
    return "train" if b < 52428 else ("test" if b >= 58982 else "val")


def test_contamination_matches_python_model(spark):
    out = {
        r.doc_id: r
        for r in REGISTRY["corpus_ngram_contamination"].fn(spark, SF0001).collect()
    }
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    grams: dict[int, list[str]] = {}
    for _, row in docs.iterrows():
        ws = [w for w in row["text"].strip().split(" ") if w != ""]
        grams[int(row["doc_id"])] = [
            " ".join(ws[i : i + 5]) for i in range(len(ws) - 4)
        ]
    train = {
        g
        for did, gs in grams.items()
        if _split_of(did) == "train"
        for g in gs
    }
    expect = {}
    for did, gs in grams.items():
        if _split_of(did) != "test" or not gs:
            continue
        hits = sum(1 for g in gs if g in train)
        expect[did] = (len(gs), hits)
    assert set(out) == set(expect)
    for did, (n, hits) in expect.items():
        r = out[did]
        assert (r.n_grams, r.n_contaminated) == (n, hits)
        assert r.contaminated_share == _f(hits) / _f(n)
        assert r.flag_contaminated == int(2 * hits >= n)
    assert sum(h for _, h in expect.values()) > 0  # non-degenerate corpus


def test_contamination_exact_copy_flags(spark, tmp_path):
    """A test-split doc that is an exact copy of a train-split doc
    reads share = 1.0 and flags; short docs (< 5 words) drop out."""
    # doc_id 3 is test (bucket 62343), doc_id 1 is train (bucket 46243)
    assert _split_of(1) == "train" and _split_of(3) == "test"
    text = "alpha beta gamma delta epsilon zeta eta"
    docs = _docs([text, text, "too short text"], ids=[1, 3, 8])
    assert _split_of(8) == "train"
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("corpus_ngram_contamination", spark, sf)
    assert r.ok, str(r)
    out = REGISTRY["corpus_ngram_contamination"].fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0].doc_id == 3
    assert out[0].contaminated_share == 1.0
    assert out[0].flag_contaminated == 1


# ---------------------------------------------------------------------------
# text_rake_keywords
# ---------------------------------------------------------------------------

_EN_STOPS = {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"}


def _rake_replay(texts):
    all_phrases = []  # canonical RAKE: word stats over ALL candidates
    for text in texts:
        toks = [w for w in text.strip().lower().split(" ") if w != ""]
        phrase: list[str] = []
        phrases: list[list[str]] = []
        for w in toks:
            if w in _EN_STOPS:
                if phrase:
                    phrases.append(phrase)
                phrase = []
            else:
                phrase.append(w)
        if phrase:
            phrases.append(phrase)
        all_phrases.extend(phrases)
    freq: dict[str, int] = {}
    degree: dict[str, int] = {}
    for p in all_phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            degree[w] = degree.get(w, 0) + len(p)
    score_q = {w: _tdiv(degree[w] * 1000000, freq[w]) for w in freq}
    agg: dict[str, list] = {}
    for p in all_phrases:
        if len(p) > 4:  # the cap applies only to the readout
            continue
        key = " ".join(p)
        sc = sum(score_q[w] for w in p)
        if key not in agg:
            agg[key] = [len(p), 0, sc]
        agg[key][1] += 1
    rows = sorted(agg.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    return [
        (k, v[0], v[1], v[2] / 1e6) for k, v in rows
    ]


def test_rake_matches_python_model(spark):
    out = REGISTRY["text_rake_keywords"].fn(spark, SF0001).collect()
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    expect = _rake_replay(docs["text"].tolist())
    assert len(out) == len(expect) == 20
    for r, (phrase, n_words, n_occ, score) in zip(out, expect):
        assert r.phrase == phrase
        assert r.n_words == n_words
        assert r.n_occurrences == n_occ
        assert r.rake_score == score


def test_rake_degenerates(spark, tmp_path):
    """All-stopword docs yield no candidates (0 rows); a > 4-word run
    is dropped while its repeated 2-word phrase survives with
    n_occurrences = 2; leading/trailing phrases are kept."""
    sf = _mk_sf(tmp_path, documents=_docs(["the and of to a", "in is it that for"]))
    assert check_query("text_rake_keywords", spark, sf).ok
    assert REGISTRY["text_rake_keywords"].fn(spark, sf).count() == 0
    docs = _docs(
        [
            "red fox and red fox in one two three four five the end",
            "lone wolf",
        ]
    )
    sf2 = _mk_sf(tmp_path / "b", documents=docs)
    assert check_query("text_rake_keywords", spark, sf2).ok
    out = {r.phrase: r for r in REGISTRY["text_rake_keywords"].fn(spark, sf2).collect()}
    assert "one two three four five" not in out  # 5 words: dropped
    assert out["red fox"].n_occurrences == 2
    assert "lone wolf" in out and "end" in out
