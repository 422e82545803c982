"""Round-13 late batch: replays, crafted degenerates, and the
plan-equivalence proof for the three additions queued for r14 block 1
(events_markov_entropy_chunked, text_repetition_profile,
stat_tukey_fences)."""

from __future__ import annotations

from tests.test_round12_prehardening_r6 import (
    SF0001,
    _docs,
    _events,
    _mk_sf,
    _orders,
)
from tests.test_round13_ops import _half_cents

import pandas as pd

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


# ---------------------------------------------------------------------------
# events_markov_entropy_chunked — the skew dial must be EXACTLY
# equivalent to the single-partition form
# ---------------------------------------------------------------------------


def _rows_set(df):
    return sorted(map(tuple, df.collect()))


def test_chunked_equals_plain_on_corpus(spark):
    a = _rows_set(REGISTRY["events_markov_entropy"].fn(spark, SF0001))
    b = _rows_set(
        REGISTRY["events_markov_entropy_chunked"].fn(spark, SF0001)
    )
    assert a == b


def test_chunked_boundary_stitching(spark, tmp_path):
    """Transitions that cross midnight — and ones that span a
    multi-day GAP between a user's active days — must stitch exactly
    (chunk order is by rn over ACTIVE days, not day arithmetic)."""
    rows = [
        # user 1: two events on day 1, one on day 2 (midnight cross),
        # then a 4-day gap to day 6 (gap stitch)
        ("g0", "2024-03-01 23:00:00", 1, "view", 1.0),
        ("g1", "2024-03-01 23:30:00", 1, "click", 1.0),
        ("g2", "2024-03-02 00:10:00", 1, "purchase", 1.0),
        ("g3", "2024-03-06 09:00:00", 1, "view", 1.0),
        # user 2: single-day-only activity (no boundaries at all)
        ("g4", "2024-03-01 10:00:00", 2, "click", 1.0),
        ("g5", "2024-03-01 11:00:00", 2, "click", 1.0),
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("events_markov_entropy_chunked", spark, sf).ok
    a = _rows_set(REGISTRY["events_markov_entropy"].fn(spark, sf))
    b = _rows_set(REGISTRY["events_markov_entropy_chunked"].fn(spark, sf))
    assert a == b
    # the transition multiset really includes the cross-day pairs:
    # view->click, click->purchase (midnight), purchase->view (gap),
    # click->click (user 2)
    got = {r[0]: r[1] for r in b}  # prev_type -> n_out
    assert got == {"view": 1, "click": 2, "purchase": 1}


def test_chunked_single_event_user(spark, tmp_path):
    one = [("s0", "2024-03-01 01:00:00", 1, "view", 1.0)]
    sf = _mk_sf(tmp_path, events=_events(one))
    assert check_query("events_markov_entropy_chunked", spark, sf).ok
    assert (
        REGISTRY["events_markov_entropy_chunked"].fn(spark, sf).count() == 0
    )


# ---------------------------------------------------------------------------
# text_repetition_profile
# ---------------------------------------------------------------------------


def _repetition_replay(texts):
    from collections import Counter

    toks = [
        [w for w in t.strip().lower().split(" ") if w != ""] for t in texts
    ]
    out = {}
    for n in (2, 3):
        grams = Counter()
        for ws in toks:
            for i in range(len(ws) - n + 1):
                grams[" ".join(ws[i : i + n])] += 1
        total = sum(grams.values())
        top = max(grams.values()) if grams else 0
        dup = sum(c - 1 for c in grams.values())
        if total:
            out[n] = (total, top, dup, top / total, dup / total)
    return out


def test_repetition_matches_python_model(spark):
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    model = _repetition_replay(list(docs["text"]))
    got = {
        r.gram_n: (r.total_grams, r.top_gram_count, r.dup_instances,
                   r.top_gram_share, r.dup_instance_share)
        for r in REGISTRY["text_repetition_profile"].fn(spark, SF0001).collect()
    }
    assert got == model


def test_repetition_collapse_and_too_short(spark, tmp_path):
    """A decode-collapsed doc reads top-2-gram share 1.0; a corpus of
    single-token docs has NO grams (0 rows on both engines)."""
    collapsed = _docs(["a a a a a a"])
    sf = _mk_sf(tmp_path / "a", documents=collapsed)
    assert check_query("text_repetition_profile", spark, sf).ok
    got = {
        r.gram_n: r
        for r in REGISTRY["text_repetition_profile"].fn(spark, sf).collect()
    }
    assert got[2].top_gram_share == 1.0
    assert got[2].dup_instance_share == 4 / 5
    assert got[3].top_gram_share == 1.0

    singles = _docs(["alpha", "beta"])
    sf2 = _mk_sf(tmp_path / "b", documents=singles)
    assert check_query("text_repetition_profile", spark, sf2).ok
    assert REGISTRY["text_repetition_profile"].fn(spark, sf2).count() == 0


# ---------------------------------------------------------------------------
# stat_tukey_fences
# ---------------------------------------------------------------------------


def _quartile(xs, p):
    """Spark percentile / DuckDB PERCENTILE_CONT: exact dyadic
    interpolation at index (n-1)*p over the sorted values."""
    s = sorted(xs)
    n = len(s)
    idx = (n - 1) * p
    lo = int(idx)
    frac = idx - lo
    if frac == 0:
        return float(s[lo])
    return (1 - frac) * s[lo] + frac * s[lo + 1]


def _tukey_replay(prices):
    hc = _half_cents(prices)
    q1, q3 = _quartile(hc, 0.25), _quartile(hc, 0.75)
    iqr = q3 - q1
    low = sum(1 for x in hc if x < q1 - 1.5 * iqr)
    high = sum(1 for x in hc if x > q3 + 1.5 * iqr)
    return len(hc), q1 / 200, q3 / 200, iqr / 200, low, high


def test_tukey_matches_python_model(spark):
    orders = pd.read_parquet(f"{SF0001}/orders.parquet")
    n, q1, q3, iqr, lo, hi = _tukey_replay(list(orders["o_totalprice"]))
    r = REGISTRY["stat_tukey_fences"].fn(spark, SF0001).collect()[0]
    assert (r.n, r.q1_price, r.q3_price, r.iqr_price) == (n, q1, q3, iqr)
    assert (r.n_low_outliers, r.n_high_outliers) == (lo, hi)


def test_tukey_degenerates(spark, tmp_path):
    """All-identical prices: IQR 0, nothing flagged; a spiked table
    flags exactly the spike (high side); empty orders yields the
    NULL-profile row."""
    same = [(i, 1, "O", 42.0, "2024-01-01", "1-URGENT") for i in range(8)]
    sf = _mk_sf(tmp_path / "a", orders=_orders(same))
    assert check_query("stat_tukey_fences", spark, sf).ok
    r = REGISTRY["stat_tukey_fences"].fn(spark, sf).collect()[0]
    assert (r.iqr_price, r.n_low_outliers, r.n_high_outliers) == (0.0, 0, 0)

    spiked = [(i, 1, "O", 100.0 + i, "2024-01-01", "1-URGENT")
              for i in range(12)] + [
        (98, 1, "O", 1e6, "2024-01-01", "1-URGENT"),
        (99, 1, "O", 0.01, "2024-01-01", "1-URGENT"),
    ]
    sf2 = _mk_sf(tmp_path / "b", orders=_orders(spiked))
    assert check_query("stat_tukey_fences", spark, sf2).ok
    r2 = REGISTRY["stat_tukey_fences"].fn(spark, sf2).collect()[0]
    n, q1, q3, iqr, lo, hi = _tukey_replay(
        [100.0 + i for i in range(12)] + [1e6, 0.01]
    )
    assert (r2.q1_price, r2.q3_price) == (q1, q3)
    assert (r2.n_low_outliers, r2.n_high_outliers) == (lo, hi) == (1, 1)

    sf3 = _mk_sf(tmp_path / "c", orders=_orders([]))
    assert check_query("stat_tukey_fences", spark, sf3).ok
    r3 = REGISTRY["stat_tukey_fences"].fn(spark, sf3).collect()[0]
    assert r3.n == 0 and r3.q1_price is None


# ---------------------------------------------------------------------------
# events_sessionization_chunked — the renumbering stitch must be
# exactly equivalent, including sessions chained across MANY chunks
# ---------------------------------------------------------------------------


def test_sessionization_chunked_equals_plain_on_corpus(spark):
    a = _rows_set(REGISTRY["events_sessionization"].fn(spark, SF0001))
    b = _rows_set(
        REGISTRY["events_sessionization_chunked"].fn(spark, SF0001)
    )
    assert a == b


def test_sessionization_chunked_multi_day_chain(spark, tmp_path):
    """The stitch's hardest case: ONE session spanning three chunk
    boundaries (events every 20 min across four midnights), beside a
    session that ends exactly AT a boundary gap and a fresh one after
    — global ids must renumber inductively across the whole chain."""
    rows = []
    # user 1: a 4-day chain — 23:40, 00:00, 00:20 around each of
    # three midnights, all gaps exactly 20 min < 30
    import datetime as dt

    t = dt.datetime(2024, 3, 1, 23, 40)
    for i in range(3 * 8):  # 8 hours of 20-min steps spans midnights
        rows.append((f"c{i}", t.strftime("%Y-%m-%d %H:%M:%S"), 1,
                     "view", 1.0))
        t += dt.timedelta(minutes=20)
    # user 2: one session ending 23:50, a NEW session at 00:40 next
    # day (gap 50 min > 30) — the boundary must NOT merge them
    rows += [
        ("d0", "2024-03-01 23:30:00", 2, "view", 1.0),
        ("d1", "2024-03-01 23:50:00", 2, "view", 1.0),
        ("d2", "2024-03-02 00:40:00", 2, "view", 1.0),
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("events_sessionization_chunked", spark, sf).ok
    a = _rows_set(REGISTRY["events_sessionization"].fn(spark, sf))
    b = _rows_set(REGISTRY["events_sessionization_chunked"].fn(spark, sf))
    assert a == b
    u1 = [r for r in b if r[0] == 1]
    assert len(u1) == 1 and u1[0][4] == 24  # one chained session
    u2 = sorted((r for r in b if r[0] == 2), key=lambda r: r[1])
    assert [r[4] for r in u2] == [2, 1]  # boundary did not merge
