"""Round-12 late batch: python-model replays + crafted degenerate
differentials for ml_youden_threshold, ml_weighted_kappa,
events_pacf_daily, events_seasonal_strength, text_yule_k,
corpus_split_balance_kl, embeddings_participation_ratio."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
from tests.test_round11_late import (
    SF0001,
    _coin,
    _docs,
    _embs,
    _events,
    _mk_sf,
    _orders,
)
from tests.test_round12_ops import _daily_event_counts

_ensure_loaded()


# ---------------------------------------------------------------------------
# ml_youden_threshold
# ---------------------------------------------------------------------------


def _youden_replay(scores):
    """scores: (value, is_pos) list -> (p, n, thr, tpr, fpr, j)."""
    byv: dict[float, list[int]] = {}
    for v, pos in scores:
        c = byv.setdefault(v, [0, 0])
        c[pos] += 1
    p = sum(c[1] for c in byv.values())
    n = sum(c[0] for c in byv.values())
    if p == 0 or n == 0:
        return p, n, None, 0.0, 0.0, 0.0
    best = None
    pos_below = all_below = 0
    for v in sorted(byv):
        tp = p - pos_below
        fp = n - (all_below - pos_below)
        j_num = tp * n - fp * p
        # argmax with lowest-threshold tiebreak: strictly greater wins
        if best is None or j_num > best[0]:
            best = (j_num, v, tp, fp)
        pos_below += byv[v][1]
        all_below += byv[v][0] + byv[v][1]
    j_num, v, tp, fp = best
    return p, n, v, tp / p, fp / n, j_num / (p * n)


def test_youden_matches_python_model(spark):
    ev = pd.read_parquet(f"{SF0001}/events.parquet").dropna(subset=["value"])
    scores = [
        (float(v), int(t == "purchase"))
        for v, t in zip(ev["value"], ev["event_type"])
    ]
    p, n, thr, tpr, fpr, j = _youden_replay(scores)
    row = REGISTRY["ml_youden_threshold"].fn(spark, SF0001).collect()[0]
    assert (row.n_pos, row.n_neg) == (p, n)
    assert row.best_threshold == thr
    assert row.tpr_at_best == tpr and row.fpr_at_best == fpr
    assert row.youden_j == j


def test_youden_perfect_ties_and_one_class(spark, tmp_path):
    """A perfect separator reads J = 1.0 at the lowest positive score;
    an uninformative single-score table reads J = 0; one-class pins
    J = 0 with a NULL threshold."""
    rows = [(f"p{i}", "2024-01-01 01:00:00", f"u{i}", "purchase",
             500.0 + i) for i in range(10)]
    rows += [(f"n{i}", "2024-01-01 02:00:00", f"v{i}", "view", float(i))
             for i in range(40)]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("ml_youden_threshold", spark, sf).ok
    row = REGISTRY["ml_youden_threshold"].fn(spark, sf).collect()[0]
    assert row.youden_j == 1.0
    assert row.best_threshold == 500.0
    assert (row.tpr_at_best, row.fpr_at_best) == (1.0, 0.0)

    tied = [(f"t{i}", "2024-01-01 03:00:00", f"w{i}",
             "purchase" if i % 2 == 0 else "view", 42.0) for i in range(10)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(tied))
    assert check_query("ml_youden_threshold", spark, sf2).ok
    row2 = REGISTRY["ml_youden_threshold"].fn(spark, sf2).collect()[0]
    assert row2.youden_j == 0.0  # TP=P, FP=N at the single threshold

    onec = [(f"o{i}", "2024-01-01 04:00:00", f"x{i}", "view", float(i))
            for i in range(5)]
    sf3 = _mk_sf(tmp_path / "c", events=_events(onec))
    assert check_query("ml_youden_threshold", spark, sf3).ok
    row3 = REGISTRY["ml_youden_threshold"].fn(spark, sf3).collect()[0]
    assert row3.youden_j == 0.0 and row3.best_threshold is None


# ---------------------------------------------------------------------------
# ml_weighted_kappa
# ---------------------------------------------------------------------------


def _wkappa_replay(orders: pd.DataFrame):
    n = len(orders)
    o_w = 0
    r = [0, 0, 0]
    c = [0, 0, 0]
    for _, row in orders.iterrows():
        pr = row["o_orderpriority"]
        r1 = 2 if pr in ("1-URGENT", "2-HIGH") else (1 if pr == "3-MEDIUM" else 0)
        coin = _coin(f"wk#{int(row['o_orderkey'])}")
        if coin < 6554:
            r2 = min(r1 + 1, 2)
        elif coin >= 58982:
            r2 = max(r1 - 1, 0)
        else:
            r2 = r1
        o_w += (r1 - r2) ** 2
        r[r1] += 1
        c[r2] += 1
    e_w = sum(
        (i - j) ** 2 * r[i] * c[j] for i in range(3) for j in range(3)
    )
    if n == 0 or e_w == 0:
        return n, 0.0, 0.0, 0.0
    return n, o_w / n, e_w / (n * n), 1.0 - (n * o_w) / e_w


def test_weighted_kappa_matches_python_model(spark):
    row = REGISTRY["ml_weighted_kappa"].fn(spark, SF0001).collect()[0]
    n, ow, ew, k = _wkappa_replay(pd.read_parquet(f"{SF0001}/orders.parquet"))
    assert row.n_items == n
    assert row.observed_w_disagreement == ow
    assert row.expected_w_disagreement == ew
    assert row.weighted_kappa == k
    assert 0.8 < k < 1.0  # 20%-shift construction: strong agreement


def test_weighted_kappa_degenerates(spark, tmp_path):
    """Perfect agreement (keys whose coin sits in the no-shift band)
    reads kappa 1.0; an all-one-level table on BOTH margins reads
    E = 0 and pins 0."""
    mid_keys = [
        k for k in range(1, 2000) if 6554 <= _coin(f"wk#{k}") < 58982
    ][:6]
    assert len(mid_keys) == 6
    orders = _orders([10.0] * 6, priorities=["1-URGENT"] * 3 + ["5-LOW"] * 3)
    orders["o_orderkey"] = pd.array(mid_keys, dtype="int64")
    sf = _mk_sf(tmp_path, orders=orders)
    assert check_query("ml_weighted_kappa", spark, sf).ok
    row = REGISTRY["ml_weighted_kappa"].fn(spark, sf).collect()[0]
    assert (row.observed_w_disagreement, row.weighted_kappa) == (0.0, 1.0)

    low = _orders([10.0] * 6, priorities=["5-LOW"] * 6)
    low["o_orderkey"] = pd.array(mid_keys, dtype="int64")
    sf2 = _mk_sf(tmp_path / "b", orders=low)
    assert check_query("ml_weighted_kappa", spark, sf2).ok
    row2 = REGISTRY["ml_weighted_kappa"].fn(spark, sf2).collect()[0]
    assert (row2.expected_w_disagreement, row2.weighted_kappa) == (0.0, 0.0)


# ---------------------------------------------------------------------------
# events_pacf_daily
# ---------------------------------------------------------------------------


def _pacf_replay(daily: dict[int, int]):
    days = sorted(daily)
    n = len(days)
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    total = sum(daily.values())
    e = {d: daily[d] * n - total for d in days}
    den = sum(v * v for v in e.values())
    if den == 0:
        return n, 0.0, 0.0, 0.0
    r = {}
    for lag in (1, 2, 3):
        r[lag] = (
            sum(e[d] * e[d + lag] for d in days if d + lag in e) / den
        )
    r1, r2, r3 = r[1], r[2], r[3]
    den2 = 1.0 - r1 * r1
    if den2 == 0.0:
        return n, r1, 0.0, 0.0
    a22 = (r2 - r1 * r1) / den2
    a21 = r1 - a22 * r1
    den3 = 1.0 - a21 * r1 - a22 * r2
    p3 = 0.0 if den3 == 0.0 else (r3 - a21 * r2 - a22 * r1) / den3
    return n, r1, a22, p3


def test_pacf_matches_python_model(spark):
    row = REGISTRY["events_pacf_daily"].fn(spark, SF0001).collect()[0]
    n, p1, p2, p3 = _pacf_replay(_daily_event_counts())
    assert row.n_days == n
    assert row.pacf_1 == p1
    assert row.pacf_2 == p2
    assert row.pacf_3 == p3


def test_pacf_constant_and_alternating(spark, tmp_path):
    """A constant daily series pins all three to 0 (den_q = 0); an
    alternating series reads pacf_1 < 0 and matches the replay
    exactly."""
    flat = [(f"c{i}", f"2024-04-{(i % 12) + 1:02d} 01:00:00", "u0",
             "view", 1.0) for i in range(24)]
    sf = _mk_sf(tmp_path, events=_events(flat))
    assert check_query("events_pacf_daily", spark, sf).ok
    row = REGISTRY["events_pacf_daily"].fn(spark, sf).collect()[0]
    assert (row.pacf_1, row.pacf_2, row.pacf_3) == (0.0, 0.0, 0.0)

    rows = []
    eid = 0
    for d in range(1, 13):
        for k in range(4 if d % 2 == 0 else 1):
            rows.append((f"a{eid}", f"2024-04-{d:02d} 01:00:00", "u0",
                         "view", 1.0))
            eid += 1
    sf2 = _mk_sf(tmp_path / "b", events=_events(rows))
    assert check_query("events_pacf_daily", spark, sf2).ok
    row2 = REGISTRY["events_pacf_daily"].fn(spark, sf2).collect()[0]
    n, p1, p2, p3 = _pacf_replay(
        {d: (4 if d % 2 == 0 else 1) for d in range(1, 13)}
    )
    assert row2.pacf_1 == p1 and row2.pacf_1 < 0
    assert row2.pacf_2 == p2 and row2.pacf_3 == p3


# ---------------------------------------------------------------------------
# events_seasonal_strength
# ---------------------------------------------------------------------------


def _seasonal_strength_replay(daily: dict[int, int]):
    if not daily:
        return 0, 0, 0.0
    groups: dict[int, list[int]] = {}
    for d, x in daily.items():
        groups.setdefault((d + 3) % 7 + 1, []).append(x)
    n = len(daily)
    s = sum(daily.values())
    ssq_milli = sum(x * x * 1000 for x in daily.values())
    bq = sum(
        math.floor(sum(xs) * sum(xs) / len(xs) * 1000)
        for xs in groups.values()
    )
    tq = math.floor(s * s / n * 1000)
    ssb = max(bq - tq, 0)
    sst = ssq_milli - tq
    return n, len(groups), (0.0 if sst <= 0 else ssb / sst)


def test_seasonal_strength_matches_python_model(spark):
    row = REGISTRY["events_seasonal_strength"].fn(spark, SF0001).collect()[0]
    n, n_dows, eta2 = _seasonal_strength_replay(_daily_event_counts())
    assert (row.n_days, row.n_dows) == (n, n_dows)
    assert row.eta2_dow == eta2


def test_seasonal_strength_perfect_and_flat(spark, tmp_path):
    """A volume determined ENTIRELY by weekday reads eta2 = 1 (within
    the milli-quantization); a constant series reads SST <= 0 -> 0."""
    rows = []
    eid = 0
    for d in range(1, 15):  # two full ISO weeks
        dow = (d + 18721 + 3) % 7 + 1  # actual dow of 2024-04-d
        for k in range(dow * 2):  # count is a pure function of dow
            rows.append((f"e{eid}", f"2024-04-{d:02d} 01:00:00", "u0",
                         "view", 1.0))
            eid += 1
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("events_seasonal_strength", spark, sf).ok
    row = REGISTRY["events_seasonal_strength"].fn(spark, sf).collect()[0]
    assert row.eta2_dow > 0.999

    flat = [(f"f{i}", f"2024-04-{(i % 14) + 1:02d} 02:00:00", "u0",
             "view", 1.0) for i in range(28)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(flat))
    assert check_query("events_seasonal_strength", spark, sf2).ok
    assert REGISTRY["events_seasonal_strength"].fn(spark, sf2).collect()[0].eta2_dow == 0.0


# ---------------------------------------------------------------------------
# text_yule_k
# ---------------------------------------------------------------------------


def test_yule_k_matches_python_model(spark):
    row = REGISTRY["text_yule_k"].fn(spark, SF0001).collect()[0]
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    wc = Counter(
        w for t in docs["text"] for w in t.strip().lower().split(" ") if w
    )
    t = sum(wc.values())
    m2 = sum(c * c for c in wc.values())
    assert (row.vocab, row.tokens) == (len(wc), t)
    assert row.yule_k == 10000.0 * (float(m2) - float(t)) / (float(t) * float(t))


def test_yule_k_extremes(spark, tmp_path):
    """All-distinct tokens read K = 0 (no repetition); a single
    repeated word reads K = 1e4*(T-1)/T; empty corpus pins 0."""
    docs = _docs(["a b c d e f g h"])
    sf = _mk_sf(tmp_path, documents=docs)
    assert check_query("text_yule_k", spark, sf).ok
    assert REGISTRY["text_yule_k"].fn(spark, sf).collect()[0].yule_k == 0.0

    rep = _docs([" ".join(["dup"] * 20)])
    sf2 = _mk_sf(tmp_path / "b", documents=rep)
    assert check_query("text_yule_k", spark, sf2).ok
    row2 = REGISTRY["text_yule_k"].fn(spark, sf2).collect()[0]
    assert row2.yule_k == 10000.0 * (400.0 - 20.0) / 400.0

    sf3 = _mk_sf(tmp_path / "c", documents=_docs(["", "  "]))
    assert check_query("text_yule_k", spark, sf3).ok
    assert REGISTRY["text_yule_k"].fn(spark, sf3).collect()[0].yule_k == 0.0


# ---------------------------------------------------------------------------
# corpus_split_balance_kl
# ---------------------------------------------------------------------------


def _split_kl_replay(id_source):
    by_src: dict[str, list[int]] = {}
    for did, src in id_source:
        by_src.setdefault(src, []).append(did)
    nt = len(id_source)
    mt = sum(
        1 for did, _ in id_source if _coin(str(did)) < 52428
    )
    kl_q = 0
    missing = 0
    for src, dids in by_src.items():
        m_s = sum(1 for d in dids if _coin(str(d)) < 52428)
        if m_s == 0:
            missing += 1
            continue
        p = m_s / mt
        q = len(dids) / nt
        kl_q += math.floor(p * math.log(p / q) * 1e9)
    return len(by_src), missing, mt, nt, (0.0 if mt == 0 else kl_q / 1e9)


def test_split_kl_matches_python_model(spark):
    row = REGISTRY["corpus_split_balance_kl"].fn(spark, SF0001).collect()[0]
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    ns, miss, mt, nt, kl = _split_kl_replay(
        list(zip(docs["doc_id"].astype(int), docs["source"]))
    )
    assert (row.n_sources, row.n_sources_missing_in_train) == (ns, miss)
    assert (row.n_train_docs, row.n_docs) == (mt, nt)
    assert row.kl_train_vs_corpus == kl


def test_split_kl_single_source_and_missing(spark, tmp_path):
    """A single-source corpus reads KL = 0 exactly (p = q = 1); a
    source whose every doc falls outside the train buckets counts as
    missing."""
    ids = list(range(1, 41))
    docs = _docs([f"doc {i} words here" for i in ids], ids=ids)
    docs["source"] = ["only"] * len(ids)
    sf = _mk_sf(tmp_path, documents=docs)
    assert check_query("corpus_split_balance_kl", spark, sf).ok
    row = REGISTRY["corpus_split_balance_kl"].fn(spark, sf).collect()[0]
    assert (row.n_sources, row.kl_train_vs_corpus) == (1, 0.0)

    out_ids = [i for i in range(1, 500) if _coin(str(i)) >= 52428][:5]
    in_ids = [i for i in range(1, 500) if _coin(str(i)) < 52428][:20]
    docs2 = _docs(
        [f"doc {i}" for i in out_ids + in_ids], ids=out_ids + in_ids
    )
    docs2["source"] = ["never_train"] * len(out_ids) + ["main"] * len(in_ids)
    sf2 = _mk_sf(tmp_path / "b", documents=docs2)
    assert check_query("corpus_split_balance_kl", spark, sf2).ok
    row2 = REGISTRY["corpus_split_balance_kl"].fn(spark, sf2).collect()[0]
    assert row2.n_sources_missing_in_train == 1
    ns, miss, mt, nt, kl = _split_kl_replay(
        [(i, "never_train") for i in out_ids]
        + [(i, "main") for i in in_ids]
    )
    assert row2.kl_train_vs_corpus == kl and kl > 0


# ---------------------------------------------------------------------------
# embeddings_participation_ratio
# ---------------------------------------------------------------------------


def _pr_replay(vecs):
    q = np.floor(np.asarray(vecs, dtype=np.float64) * 1000).astype(np.int64)
    n, d = q.shape
    p = q.T @ q  # exact int64
    s = q.sum(axis=0)
    cv = (n * p - np.outer(s, s)).astype(np.float64) / (float(n) * float(n))
    tr_q = int(sum(math.floor(cv[i, i] * 1e6) for i in range(d)))
    tr2_q = 0
    for i in range(d):
        for j in range(i, d):
            mult = 1 if i == j else 2
            tr2_q += mult * math.floor(cv[i, j] * cv[i, j] * 1e3)
    pr = 0.0 if tr2_q <= 0 else (tr_q / 1e6) * (tr_q / 1e6) / (tr2_q / 1e3)
    # two divisions, matching the SQL's /1e6/1e6 rounding order
    return n, d, tr_q / 1e6 / 1e6, pr


def test_participation_ratio_matches_numpy_replay(spark):
    emb = pd.read_parquet(f"{SF0001}/embeddings.parquet")
    vecs = np.stack(emb["embedding"].to_numpy())
    n, d, tr, pr = _pr_replay(vecs)
    row = REGISTRY["embeddings_participation_ratio"].fn(spark, SF0001).collect()[0]
    assert (row.n_vectors, row.n_dims) == (n, d)
    assert row.trace_cov == tr
    assert row.participation_ratio == pr
    assert 40 < pr <= 64  # near-isotropic synthetic embeddings


def test_participation_ratio_rank_one_collapse(spark, tmp_path):
    """Vectors all on ONE direction (+-e1 scaled): the covariance is
    rank 1 and PR reads ~1. 64-dim contract honored (zero-padded)."""
    vecs = []
    for i in range(24):
        v = [0.0] * 64
        v[0] = 1.0 if i % 2 == 0 else -1.0
        vecs.append(v)
    sf = _mk_sf(tmp_path, embeddings=_embs(vecs, [0] * len(vecs)))
    assert check_query("embeddings_participation_ratio", spark, sf).ok
    row = REGISTRY["embeddings_participation_ratio"].fn(spark, sf).collect()[0]
    assert abs(row.participation_ratio - 1.0) < 1e-3
    n, d, tr, pr = _pr_replay(vecs)
    assert row.participation_ratio == pr
