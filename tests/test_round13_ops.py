"""Round-13 additions: python-model replays against the corpus plus
crafted degenerate differentials for the five new operators
(ml_ks_separation, events_markov_entropy, text_distinct_ngrams,
stat_mad_robust_z, sketch_quantile_bottomk), and the bottom-k merge
identity the quantile sketch's mergeability claim rests on.

Replays recompute the exact integer/quantization chains the SQL
declares (math.floor where it uses FLOOR, the interpolated-median
index arithmetic percentile/PERCENTILE_CONT share) so equality
asserts are exact, not approximate."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
from tests.test_round12_prehardening_r6 import (
    SF0001,
    _docs,
    _events,
    _mk_sf,
    _orders,
)

_ensure_loaded()


# ---------------------------------------------------------------------------
# ml_ks_separation
# ---------------------------------------------------------------------------


def _ksep_replay(scores):
    """scores: list of (value, is_pos). Exact integer KS: max over
    distinct v of |cum1*N - cum2*P|, threshold = smallest attaining v."""
    c = Counter()
    for v, pos in scores:
        c[v] = c[v]
        c[(v, "p")] = c.get((v, "p"), 0) + (1 if pos else 0)
        c[(v, "n")] = c.get((v, "n"), 0) + (0 if pos else 1)
    vals = sorted({v for v, _ in scores})
    P = sum(c[(v, "p")] for v in vals)
    N = sum(c[(v, "n")] for v in vals)
    cum1 = cum2 = 0
    best, thr = -1, None
    for v in vals:
        cum1 += c[(v, "p")]
        cum2 += c[(v, "n")]
        diff = abs(cum1 * N - cum2 * P)
        if diff > best:
            best, thr = diff, v
    if P == 0 or N == 0:
        return P, N, 0.0, None
    return P, N, best / (float(P) * float(N)), thr


def test_ksep_matches_python_model(spark):
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev.dropna(subset=["value"])
    scores = [
        (float(v), t == "purchase")
        for v, t in zip(ev["value"], ev["event_type"])
    ]
    p, n, ks, thr = _ksep_replay(scores)
    row = REGISTRY["ml_ks_separation"].fn(spark, SF0001).collect()[0]
    assert (row.n_pos, row.n_neg) == (p, n)
    assert row.ks_stat == ks
    assert row.ks_threshold == thr


def test_ksep_one_class_and_perfect_separation(spark, tmp_path):
    """All-purchase input pins ks to 0 / threshold NULL; perfectly
    separated scores read ks exactly 1.0 at the class boundary."""
    rows = [(i, "2024-02-01 01:00:00", 1, "purchase", float(i))
            for i in range(5)]
    sf = _mk_sf(tmp_path / "a", events=_events(rows))
    assert check_query("ml_ks_separation", spark, sf).ok
    r = REGISTRY["ml_ks_separation"].fn(spark, sf).collect()[0]
    assert (r.n_neg, r.ks_stat, r.ks_threshold) == (0, 0.0, None)

    sep = [(i, "2024-02-01 01:00:00", 1,
            "purchase" if i >= 10 else "view", float(i))
           for i in range(20)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(sep))
    assert check_query("ml_ks_separation", spark, sf2).ok
    r2 = REGISTRY["ml_ks_separation"].fn(spark, sf2).collect()[0]
    assert r2.ks_stat == 1.0
    assert r2.ks_threshold == 9.0  # last all-negative cumulative point


# ---------------------------------------------------------------------------
# events_markov_entropy
# ---------------------------------------------------------------------------


def _markov_replay(rows):
    """rows: (event_id, ts_str, user_id, type). Micro-nat-quantized
    conditional entropy per prev type, exactly as the SQL computes."""
    by_user = defaultdict(list)
    for eid, ts, uid, etype in rows:
        by_user[uid].append((ts, eid, etype))
    trans = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    cp = Counter()
    nn = Counter()
    for (a, _), c in trans.items():
        cp[a] += c
        nn[a] += 1
    out = {}
    for a in cp:
        qsum = sum(
            c * math.floor(math.log(cp[a] / c) * 1000000)
            for (x, _), c in trans.items()
            if x == a
        )
        out[a] = (cp[a], nn[a], qsum / cp[a] / 1000000.0)
    return out


def test_markov_matches_python_model(spark):
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev.dropna(subset=["ts", "event_type"])
    rows = list(zip(ev["event_id"], ev["ts"], ev["user_id"],
                    ev["event_type"]))
    model = _markov_replay(rows)
    got = {
        r.prev_type: (r.n_out, r.n_next_types, r.entropy_nats)
        for r in REGISTRY["events_markov_entropy"].fn(spark, SF0001).collect()
    }
    assert got == model


def test_markov_deterministic_chain_and_single_event(spark, tmp_path):
    """A strictly alternating chain has H(next|prev) = 0 for both
    states; a single event yields no transitions (0 rows)."""
    rows = [(i, f"2024-02-01 0{i}:00:00", 1,
             "view" if i % 2 == 0 else "click", 1.0) for i in range(8)]
    sf = _mk_sf(tmp_path / "a", events=_events(rows))
    assert check_query("events_markov_entropy", spark, sf).ok
    out = REGISTRY["events_markov_entropy"].fn(spark, sf).collect()
    assert {r.prev_type for r in out} == {"view", "click"}
    assert all(r.entropy_nats == 0.0 for r in out)
    assert all(r.n_next_types == 1 for r in out)

    one = [(1, "2024-02-01 01:00:00", 1, "view", 1.0)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(one))
    assert check_query("events_markov_entropy", spark, sf2).ok
    assert REGISTRY["events_markov_entropy"].fn(spark, sf2).count() == 0


# ---------------------------------------------------------------------------
# text_distinct_ngrams
# ---------------------------------------------------------------------------


def _distinct_ngrams_replay(texts):
    toks = [
        [w for w in t.strip().lower().split(" ") if w != ""] for t in texts
    ]
    n_tokens = sum(len(ws) for ws in toks)
    d1 = len({w for ws in toks for w in ws})
    bigrams = [f"{a} {b}" for ws in toks for a, b in zip(ws, ws[1:])]
    return n_tokens, d1, len(bigrams), len(set(bigrams))


def test_distinct_ngrams_matches_python_model(spark):
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    n_tok, d1, n_bi, d2 = _distinct_ngrams_replay(list(docs["text"]))
    r = REGISTRY["text_distinct_ngrams"].fn(spark, SF0001).collect()[0]
    assert (r.n_tokens, r.distinct_unigrams) == (n_tok, d1)
    assert (r.n_bigrams, r.distinct_bigrams) == (n_bi, d2)
    assert r.distinct_1 == d1 / n_tok
    assert r.distinct_2 == d2 / n_bi


def test_distinct_ngrams_degenerates(spark, tmp_path):
    """Single-token docs produce zero bigrams (LAG never crosses
    documents); an all-identical corpus collapses distinct-2 to
    1/n_bigrams of its unique pair count."""
    singles = _docs(["alpha", "beta", "alpha"])
    sf = _mk_sf(tmp_path / "a", documents=singles)
    assert check_query("text_distinct_ngrams", spark, sf).ok
    r = REGISTRY["text_distinct_ngrams"].fn(spark, sf).collect()[0]
    assert (r.n_tokens, r.distinct_unigrams, r.n_bigrams,
            r.distinct_bigrams) == (3, 2, 0, 0)
    assert r.distinct_2 == 0.0

    same = _docs(["a b a b"] * 4)
    sf2 = _mk_sf(tmp_path / "b", documents=same)
    assert check_query("text_distinct_ngrams", spark, sf2).ok
    r2 = REGISTRY["text_distinct_ngrams"].fn(spark, sf2).collect()[0]
    assert (r2.n_tokens, r2.distinct_unigrams) == (16, 2)
    assert (r2.n_bigrams, r2.distinct_bigrams) == (12, 2)


# ---------------------------------------------------------------------------
# stat_mad_robust_z
# ---------------------------------------------------------------------------


def _half_cents(prices):
    return [
        int(Decimal(repr(p)).quantize(Decimal("0.01"), ROUND_HALF_UP) * 200)
        for p in prices
    ]


def _interp_median(xs):
    """Spark percentile / DuckDB PERCENTILE_CONT at 0.5: index
    arithmetic on the sorted values, 0.5*a + 0.5*b at even counts."""
    s = sorted(xs)
    n = len(s)
    if n == 0:
        return None
    if n % 2 == 1:
        return float(s[n // 2])
    return 0.5 * s[n // 2 - 1] + 0.5 * s[n // 2]


def _mad_replay(prices):
    hc = _half_cents(prices)
    med2 = _interp_median(hc)
    ad = [abs(float(x) - med2) for x in hc]
    mad2 = _interp_median(ad)
    k = 3 * 1.4826 * mad2
    outliers = sum(1 for a in ad if mad2 > 0 and a > k)
    max_z = 0.0 if mad2 == 0 else max(ad) / (1.4826 * mad2)
    return len(hc), med2 / 200, mad2 / 200, outliers, max_z


def test_mad_matches_python_model(spark):
    orders = pd.read_parquet(f"{SF0001}/orders.parquet")
    n, med, mad, outl, mz = _mad_replay(list(orders["o_totalprice"]))
    r = REGISTRY["stat_mad_robust_z"].fn(spark, SF0001).collect()[0]
    assert (r.n, r.median_price, r.mad_price) == (n, med, mad)
    assert (r.n_outliers_3s, r.max_robust_z) == (outl, mz)


def test_mad_degenerates(spark, tmp_path):
    """All-identical prices pin MAD, outliers, and max-z to 0; one
    genuine extreme among identical values IS flagged (the breakdown
    property Grubbs lacks); an empty table yields the NULL-profile
    row on both engines."""
    same = [(i, 1, "O", 100.0, "2024-01-01", "1-URGENT") for i in range(9)]
    sf = _mk_sf(tmp_path / "a", orders=_orders(same))
    assert check_query("stat_mad_robust_z", spark, sf).ok
    r = REGISTRY["stat_mad_robust_z"].fn(spark, sf).collect()[0]
    assert (r.mad_price, r.n_outliers_3s, r.max_robust_z) == (0.0, 0, 0.0)

    spiked = same[:8] + [(99, 1, "O", 1e6, "2024-01-01", "1-URGENT")]
    sf2 = _mk_sf(tmp_path / "b", orders=_orders(spiked))
    assert check_query("stat_mad_robust_z", spark, sf2).ok
    r2 = REGISTRY["stat_mad_robust_z"].fn(spark, sf2).collect()[0]
    # median and MAD stay at the bulk; MAD=0 pins z — the documented
    # mad-zero degenerate even under a spike (8 of 9 identical)
    assert r2.median_price == 100.0
    assert (r2.mad_price, r2.n_outliers_3s, r2.max_robust_z) == (0.0, 0, 0.0)

    varied = [(i, 1, "O", 100.0 + i, "2024-01-01", "1-URGENT")
              for i in range(8)] + [(99, 1, "O", 1e6, "2024-01-01",
                                     "1-URGENT")]
    sf3 = _mk_sf(tmp_path / "c", orders=_orders(varied))
    assert check_query("stat_mad_robust_z", spark, sf3).ok
    r3 = REGISTRY["stat_mad_robust_z"].fn(spark, sf3).collect()[0]
    n, med, mad, outl, mz = _mad_replay(
        [100.0 + i for i in range(8)] + [1e6]
    )
    assert (r3.median_price, r3.mad_price) == (med, mad)
    assert r3.n_outliers_3s == outl == 1
    assert r3.max_robust_z == mz

    empty = _orders([])
    sf4 = _mk_sf(tmp_path / "d", orders=empty)
    assert check_query("stat_mad_robust_z", spark, sf4).ok
    r4 = REGISTRY["stat_mad_robust_z"].fn(spark, sf4).collect()[0]
    assert r4.n == 0
    assert r4.median_price is None and r4.mad_price is None


# ---------------------------------------------------------------------------
# sketch_quantile_bottomk
# ---------------------------------------------------------------------------


def _h32(key) -> int:
    """First 8 hex digits of md5(str(key)) — the engine's
    _kmv_spark_hash / _kmv_duck_hash 32-bit value."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


def _bottom_k(rows, k=256):
    """rows: (key, val). The sketch: k smallest (hash, key) rows."""
    return sorted(rows, key=lambda r: (_h32(r[0]), r[0]))[:k]


def _qsk_replay(rows, k=256):
    sample = sorted(v for _, v in _bottom_k(rows, k))
    ka, n = len(sample), len(rows)
    allv = sorted(v for _, v in rows)
    out = {}
    for p in (0.5, 0.9, 0.99):
        est = sample[math.ceil(p * ka) - 1]
        exact = allv[math.ceil(p * n) - 1]
        out[p] = (float(est), float(exact), abs(float(est) - float(exact)))
    return n, ka, out


def test_qsk_matches_python_model(spark):
    orders = pd.read_parquet(f"{SF0001}/orders.parquet")
    hc = [
        Decimal(repr(p)).quantize(Decimal("0.01"), ROUND_HALF_UP)
        for p in orders["o_totalprice"]
    ]
    rows = list(zip(orders["o_orderkey"], hc))
    n, k, model = _qsk_replay(rows)
    got = {
        r.quantile: (r.est_value, r.exact_value, r.abs_error)
        for r in REGISTRY["sketch_quantile_bottomk"].fn(spark, SF0001).collect()
    }
    assert set(got) == set(model)
    for p in model:
        assert got[p] == model[p], (p, got[p], model[p])


def test_qsk_small_population_is_exact(spark, tmp_path):
    """n <= k: the sample IS the population, every estimate equals
    its exact twin and abs_error is identically 0."""
    rows = [(i, 1, "O", 100.0 + 7 * i, "2024-01-01", "1-URGENT")
            for i in range(40)]
    sf = _mk_sf(tmp_path, orders=_orders(rows))
    assert check_query("sketch_quantile_bottomk", spark, sf).ok
    out = REGISTRY["sketch_quantile_bottomk"].fn(spark, sf).collect()
    assert len(out) == 3
    for r in out:
        assert r.n_rows == 40 and r.k_sample == 40
        assert r.abs_error == 0.0
        assert r.est_value == r.exact_value


def test_qsk_empty_input_yields_no_rows(spark, tmp_path):
    sf = _mk_sf(tmp_path, orders=_orders([]))
    assert check_query("sketch_quantile_bottomk", spark, sf).ok
    assert REGISTRY["sketch_quantile_bottomk"].fn(spark, sf).count() == 0


def test_bottomk_merge_identity():
    """The mergeability claim: bottom-k(A u B) ==
    bottom-k(bottom-k(A) u bottom-k(B)) — the KMV/Theta union rule
    the sketch's documentation rests on, checked over many shardings
    and k values (pure python, same md5 ordering as both engines)."""
    rows = [(i, i * 3 % 997) for i in range(1000)]
    for k in (1, 7, 64, 256, 1500):
        direct = _bottom_k(rows, k)
        for cut in (1, 100, 500, 999):
            a, b = rows[:cut], rows[cut:]
            merged = _bottom_k(_bottom_k(a, k) + _bottom_k(b, k), k)
            assert merged == direct, (k, cut)
