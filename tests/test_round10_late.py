"""Crafted-parquet differentials + python-model validations for the
round-10 LATE additions (queued for the round-11 driver window):
ml_auc_roc, stat_spearman_corr, events_acf_daily,
corpus_temperature_mixture, text_jsd_by_source."""

from __future__ import annotations

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


def _docs(texts, sources):
    # explicit dtypes so an EMPTY frame still writes string/int64
    # parquet columns (pandas would default empty columns to float64)
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": pd.array(texts, dtype="string"),
            "lang": pd.array(["en"] * len(texts), dtype="string"),
            "source": pd.array(sources, dtype="string"),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )


# -- ml_auc_roc ---------------------------------------------------------------


def test_auc_roc_matches_brute_force(spark):
    """(n_pos, n_neg, u2, auc, gini) equals brute-force pair counting
    over the real sf0.001 corpus, ties worth half."""
    row = REGISTRY["ml_auc_roc"].fn(spark, SF0001).collect()[0]
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["value"].notna()]
    pos = np.sort(ev.loc[ev["event_type"] == "purchase", "value"].to_numpy())
    neg = np.sort(ev.loc[ev["event_type"] != "purchase", "value"].to_numpy())
    below = np.searchsorted(neg, pos, side="left").sum()
    ties = (
        np.searchsorted(neg, pos, side="right")
        - np.searchsorted(neg, pos, side="left")
    ).sum()
    u2 = int(2 * below + ties)
    assert (row["n_pos"], row["n_neg"], row["u2"]) == (len(pos), len(neg), u2)
    assert row["auc"] == float(u2) / (2.0 * float(len(pos)) * float(len(neg)))
    assert row["gini"] == 2.0 * row["auc"] - 1.0


def test_auc_roc_one_class_degenerate_cross_engine(spark, tmp_path):
    """No positive rows: AUC pinned to chance 0.5 / Gini 0 on both
    engines (the integer-space guard, not a 0/0 NaN accident)."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-02", 1, "view", 10),
                (2, "2024-01-03", 1, "click", 20),
                (3, "2024-01-04", 2, "view", 30),
            ]
        ),
    )
    r = check_query("ml_auc_roc", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["ml_auc_roc"].fn(spark, sf).collect()[0]
    assert (row["n_pos"], row["auc"], row["gini"]) == (0, 0.5, 0.0)


def test_auc_roc_perfect_and_inverted_separation(spark, tmp_path):
    """Purchases all scoring above non-purchases give AUC exactly 1;
    the mirrored data gives exactly 0 — the identity's endpoints."""
    rows = [
        (1, "2024-01-02", 1, "purchase", 100),
        (2, "2024-01-02", 1, "purchase", 90),
        (3, "2024-01-03", 2, "view", 10),
        (4, "2024-01-03", 2, "click", 20),
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("ml_auc_roc", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["ml_auc_roc"].fn(spark, sf).collect()[0]
    assert (row["auc"], row["gini"]) == (1.0, 1.0)
    flipped = [
        (i, ts, u, ("purchase" if t != "purchase" else "view"), v)
        for i, ts, u, t, v in rows
    ]
    sf2 = _mk_sf(tmp_path / "b", events=_events(flipped))
    row2 = REGISTRY["ml_auc_roc"].fn(spark, sf2).collect()[0]
    assert (row2["auc"], row2["gini"]) == (0.0, -1.0)


# -- stat_spearman_corr -------------------------------------------------------


def _midrank(a: np.ndarray) -> np.ndarray:
    order = np.argsort(a, kind="stable")
    ranks = np.empty(len(a), float)
    sa = a[order]
    i = 0
    while i < len(sa):
        j = i
        while j + 1 < len(sa) and sa[j + 1] == sa[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_spearman_matches_numpy_midranks(spark):
    """rho equals Pearson on numpy midranks over the real sf0.001
    lineitem (heavy quantity ties exercise the midrank machinery)."""
    row = REGISTRY["stat_spearman_corr"].fn(spark, SF0001).collect()[0]
    li = pd.read_parquet(
        f"{SF0001}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    ).dropna()
    rx = _midrank(li["l_quantity"].to_numpy())
    ry = _midrank(li["l_extendedprice"].to_numpy())
    rho = np.corrcoef(rx, ry)[0, 1]
    assert row["n"] == len(li)
    assert row["sum_2rx"] == int(round(2 * rx.sum()))
    assert abs(row["spearman_rho"] - rho) < 1e-12


def test_spearman_constant_column_pins_zero(spark, tmp_path):
    """Constant quantity: the rank variance is 0 and rho must be the
    pinned 0.0 on both engines, not a 0/0 NaN."""
    li = pd.read_parquet(f"{SF0001}/lineitem.parquet")
    li["l_quantity"] = 7.0
    sf = _mk_sf(tmp_path, lineitem=li)
    r = check_query("stat_spearman_corr", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["stat_spearman_corr"].fn(spark, sf).collect()[0]
    assert row["spearman_rho"] == 0.0


def test_spearman_perfect_monotone_is_one(spark, tmp_path):
    """y strictly increasing in x gives rho 1 (and the negated y
    gives -1) to within one ulp of the two-SQRT denominator (the
    moments are exact; sqrt(d)*sqrt(d) != d in IEEE)."""
    li = pd.read_parquet(f"{SF0001}/lineitem.parquet").head(100).copy()
    li["l_quantity"] = np.arange(100, dtype=float)
    li["l_extendedprice"] = np.arange(100, dtype=float) * 3 + 1
    sf = _mk_sf(tmp_path, lineitem=li)
    row = REGISTRY["stat_spearman_corr"].fn(spark, sf).collect()[0]
    assert abs(row["spearman_rho"] - 1.0) < 1e-12
    li["l_extendedprice"] = -li["l_extendedprice"]
    sf2 = _mk_sf(tmp_path / "b", lineitem=li)
    r = check_query("stat_spearman_corr", spark, sf2)
    assert r.ok, str(r)
    row2 = REGISTRY["stat_spearman_corr"].fn(spark, sf2).collect()[0]
    assert abs(row2["spearman_rho"] + 1.0) < 1e-12


# -- events_acf_daily ---------------------------------------------------------


def test_acf_daily_matches_python_model(spark):
    """Every lag's (n_pairs, num_q, den_q, acf) equals a python replay
    of the multiply-through estimator on the real sf0.001 corpus."""
    got = {
        r["lag"]: r for r in REGISTRY["events_acf_daily"].fn(spark, SF0001).collect()
    }
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    # unit-agnostic epoch days (the parquet loads as datetime64[us])
    secs = (pd.to_datetime(ev["ts"]) - pd.Timestamp(0)).dt.total_seconds()
    dn = (secs // 86400).astype("int64").to_numpy()
    cnt = pd.Series(dn).value_counts().to_dict()
    days, total = len(cnt), sum(cnt.values())
    e = {k: v * days - total for k, v in cnt.items()}
    den = sum(x * x for x in e.values())
    for lag in range(1, 8):
        pairs = [(k, k + lag) for k in e if k + lag in e]
        num = sum(e[a] * e[b] for a, b in pairs)
        row = got[lag]
        assert (row["n_pairs"], row["num_q"], row["den_q"]) == (
            len(pairs), num, den,
        ), lag
        assert row["acf"] == (0.0 if den == 0 else float(num) / float(den))


def test_acf_daily_constant_series_pins_zero(spark, tmp_path):
    """Identical daily counts: den_q = 0 and every acf is the pinned
    0.0 on both engines."""
    rows = []
    for d in range(10):
        for i in range(3):
            rows.append((d * 10 + i, f"2024-01-{d+1:02d} 12:00:00", i, "view", 1))
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("events_acf_daily", spark, sf)
    assert r.ok, str(r)
    out = REGISTRY["events_acf_daily"].fn(spark, sf).collect()
    assert all(x["den_q"] == 0 and x["acf"] == 0.0 for x in out)


def test_acf_daily_calendar_gap_pairs_correctly(spark, tmp_path):
    """Days 1,2,3,10,11: lag-1 must pair (1,2),(2,3),(10,11) — three
    pairs, never four (a LEAD over observed rows would silently pair
    3 with 10). Cross-engine hash + explicit n_pairs pin."""
    rows = []
    eid = 0
    for d, n in [(1, 2), (2, 5), (3, 3), (10, 4), (11, 1)]:
        for i in range(n):
            eid += 1
            rows.append((eid, f"2024-01-{d:02d} 06:00:00", i, "view", 1))
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("events_acf_daily", spark, sf)
    assert r.ok, str(r)
    got = {x["lag"]: x["n_pairs"] for x in REGISTRY["events_acf_daily"].fn(spark, sf).collect()}
    assert got[1] == 3 and got[7] == 1  # lag7: (3,10) only
    assert got[2] == 1  # (1,3) only — (9,11) has no day 9


# -- corpus_temperature_mixture ----------------------------------------------


def test_temperature_mixture_skewed_sources_cross_engine(spark, tmp_path):
    """Skewed sources (1800/150/50): the big source is subsampled, the
    tiny one capped at its size; targets equal the python integer
    model and the hash matches DuckDB."""
    sizes = {"big": 1800, "mid": 150, "tiny": 50}
    texts, srcs = [], []
    for s, n in sizes.items():
        texts += [f"doc {s} {i}" for i in range(n)]
        srcs += [s] * n
    sf = _mk_sf(tmp_path, documents=_docs(texts, srcs))
    r = check_query("corpus_temperature_mixture", spark, sf)
    assert r.ok, str(r)
    rows = {
        x["source"]: x
        for x in REGISTRY["corpus_temperature_mixture"].fn(spark, sf).collect()
    }
    wq = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in sizes.items()}
    totq = sum(wq.values())
    for s, n in sizes.items():
        tgt = min(n, 1000 * wq[s] // totq)
        assert rows[s]["wq"] == wq[s] and rows[s]["target"] == tgt, s
        assert 0 <= rows[s]["n_kept"] <= n
    assert rows["tiny"]["target"] == 50  # capped at source size
    assert rows["big"]["target"] < 1800  # genuinely subsampled
    # up-weighting property: small sources get a larger share than
    # their raw fraction, large sources a smaller one
    assert rows["tiny"]["share"] > 50 / 2000
    assert rows["big"]["share"] < 1800 / 2000


def test_temperature_mixture_kept_rows_match_bucket_model(spark, tmp_path):
    """n_kept equals an exact md5-bucket replay (the same 16-bit coin
    the engine uses), not just a plausibility band."""
    import hashlib

    sizes = {"a": 400, "b": 100}
    texts, srcs = [], []
    for s, n in sizes.items():
        texts += [f"t {s} {i}" for i in range(n)]
        srcs += [s] * n
    docs = _docs(texts, srcs)
    sf = _mk_sf(tmp_path, documents=docs)
    rows = {
        x["source"]: x
        for x in REGISTRY["corpus_temperature_mixture"].fn(spark, sf).collect()
    }
    wq = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in sizes.items()}
    totq = sum(wq.values())
    for s, n in sizes.items():
        tgt = min(n, 1000 * wq[s] // totq)
        thr = tgt * 65536 // n
        kept = sum(
            int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) < thr
            for i, src in zip(docs["doc_id"], docs["source"])
            if src == s
        )
        assert rows[s]["n_kept"] == kept, s


# -- text_jsd_by_source -------------------------------------------------------


def _jsd_python(docs: pd.DataFrame) -> dict[str, float]:
    from collections import defaultdict

    csw: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    cw: dict[str, int] = defaultdict(int)
    for _, row in docs.iterrows():
        for w in str(row["text"]).strip().lower().split(" "):
            if w:
                csw[row["source"]][w] += 1
                cw[w] += 1
    n = sum(cw.values())
    out = {}
    for s, words in csw.items():
        ns = sum(words.values())
        jsd = 0.0
        for w, c in cw.items():
            p, q = words.get(w, 0) / ns, c / n
            m = (p + q) / 2
            if p:
                jsd += p * math.log(p / m)
            jsd += q * math.log(q / m)
        out[s] = jsd / 2
    return out


def test_jsd_matches_python_within_quantization(spark):
    """Per-source JSD equals the full-vocab python reference within
    the documented nano-quantization bound (vocab x 1e-9)."""
    got = {
        r["source"]: r["jsd"]
        for r in REGISTRY["text_jsd_by_source"].fn(spark, SF0001).collect()
    }
    docs = pd.read_parquet(f"{SF0001}/documents.parquet")
    ref = _jsd_python(docs)
    vocab = len(
        {
            w
            for t in docs["text"]
            for w in str(t).strip().lower().split(" ")
            if w
        }
    )
    assert set(got) == set(ref)
    for s in ref:
        assert abs(got[s] - ref[s]) <= vocab * 1e-9 + 1e-12, s


def test_jsd_single_source_is_exactly_zero(spark, tmp_path):
    """One source: p == q for every word, contributions are ln(1) = 0
    exactly and the absent tail is 0 exactly — jsd must be 0.0, not
    epsilon."""
    sf = _mk_sf(
        tmp_path,
        documents=_docs(["aa bb cc", "bb cc dd", "aa dd"], ["only"] * 3),
    )
    r = check_query("text_jsd_by_source", spark, sf)
    assert r.ok, str(r)
    rows = REGISTRY["text_jsd_by_source"].fn(spark, sf).collect()
    assert len(rows) == 1 and rows[0]["jsd"] == 0.0


def test_jsd_disjoint_vocab_cross_engine(spark, tmp_path):
    """Two sources with disjoint vocabularies — the maximal-divergence
    shape where the closed-form absent tail carries most of the mass;
    python replay + hash match."""
    docs = _docs(
        ["xx xx yy", "yy xx", "pp qq qq", "qq pp rr"],
        ["a", "a", "b", "b"],
    )
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("text_jsd_by_source", spark, sf)
    assert r.ok, str(r)
    got = {
        x["source"]: x["jsd"]
        for x in REGISTRY["text_jsd_by_source"].fn(spark, sf).collect()
    }
    ref = _jsd_python(docs)
    for s in ref:
        assert abs(got[s] - ref[s]) <= 16 * 1e-9, s
        # each disjoint half diverges substantially from the pooled
        # corpus (which contains the half itself, so well under ln2;
        # the real check is the replay equality above)
        assert got[s] > 0.1


def test_jsd_empty_corpus_yields_empty(spark, tmp_path):
    """Empty documents: the staged scalar is SQL NULL and the result
    is 0 rows on both engines (no crash, no NULL-row fabrication)."""
    docs = _docs([], [])
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("text_jsd_by_source", spark, sf)
    assert r.ok, str(r)
    assert REGISTRY["text_jsd_by_source"].fn(spark, sf).count() == 0


# -- events_entropy_rate ------------------------------------------------------


def test_entropy_rate_matches_python_model(spark):
    """h_next per source and the corpus H(dst|src) equal the python
    chain replay within the micro-quantization bound."""
    from collections import defaultdict

    got = {
        r["src"]: r
        for r in REGISTRY["events_entropy_rate"].fn(spark, SF0001).collect()
    }
    ev = pd.read_parquet(f"{SF0001}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    cnt: dict = defaultdict(int)
    for _, grp in ev.groupby("user_id"):
        ts = grp["event_type"].tolist()
        for a, b in zip(ts, ts[1:]):
            cnt[(a, b)] += 1
    ns: dict = defaultdict(int)
    for (a, _), n in cnt.items():
        ns[a] += n
    total = sum(cnt.values())
    h_cond = sum((n / total) * math.log(ns[a] / n) for (a, _), n in cnt.items())
    pairs = len(cnt)
    for src in ns:
        h = sum(
            (n / ns[src]) * math.log(ns[src] / n)
            for (a, _), n in cnt.items()
            if a == src
        )
        assert abs(got[src]["h_next"] - h) <= pairs * 1e-6, src
        assert got[src]["n_s"] == ns[src]
        assert abs(got[src]["h_cond"] - h_cond) <= pairs * 1e-6


def test_entropy_rate_deterministic_chain_is_zero(spark, tmp_path):
    """A fully deterministic chain (view → click → view → …) has
    h_cond exactly 0 (the two quantized integer sums cancel term by
    term) and h_next within one quantization unit of 0 (ln(n_s) is
    unquantized against the floored sum)."""
    rows = []
    for i in range(12):
        rows.append(
            (i, f"2024-01-02 00:{i:02d}:00", 1, ("view", "click")[i % 2], 1)
        )
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("events_entropy_rate", spark, sf)
    assert r.ok, str(r)
    out = REGISTRY["events_entropy_rate"].fn(spark, sf).collect()
    assert out and all(
        0.0 <= x["h_next"] <= 1e-6 and x["h_cond"] == 0.0 for x in out
    )


# -- events_burstiness --------------------------------------------------------


def test_burstiness_matches_python_model(spark):
    """B per event_type equals (σ−μ)/(σ+μ) of the python gap replay
    (population σ) on the real sf0.001 corpus."""
    from collections import defaultdict

    got = {
        r["event_type"]: r
        for r in REGISTRY["events_burstiness"].fn(spark, SF0001).collect()
    }
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    gaps: dict = defaultdict(list)
    for (_, et), grp in ev.groupby(["user_id", "event_type"]):
        t = (
            (pd.to_datetime(grp.sort_values(["ts", "event_id"])["ts"])
             - pd.Timestamp(0)).dt.total_seconds().astype(int).tolist()
        )
        gaps[et].extend(b - a for a, b in zip(t, t[1:]))
    for et, g in gaps.items():
        a = np.array(g, dtype=float)
        mu, sd = a.mean(), a.std()
        b = 0.0 if len(a) <= 1 else (sd - mu) / (sd + mu)
        assert got[et]["n"] == len(a)
        assert abs(got[et]["burstiness"] - b) < 1e-12, et


def test_burstiness_periodic_and_single_gap(spark, tmp_path):
    """Perfectly periodic gaps give B = −1 exactly (σ = 0, the SQRT
    of an exact decimal 0); a single gap hits the n ≤ 1 guard."""
    rows = [(i, f"2024-01-02 {i:02d}:00:00", 1, "view", 1) for i in range(6)]
    rows += [(10, "2024-01-02 00:00:00", 2, "click", 1),
             (11, "2024-01-02 05:00:00", 2, "click", 1)]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("events_burstiness", spark, sf)
    assert r.ok, str(r)
    got = {
        x["event_type"]: x
        for x in REGISTRY["events_burstiness"].fn(spark, sf).collect()
    }
    assert got["view"]["burstiness"] == -1.0
    assert got["click"]["n"] == 1 and got["click"]["burstiness"] == 0.0


# -- stat_cohens_d ------------------------------------------------------------


def test_cohens_d_matches_python_model(spark):
    """d per event_type equals the pooled-SD python replay over the
    micro-quantized values on the real sf0.001 corpus."""
    got = {
        r["event_type"]: r
        for r in REGISTRY["stat_cohens_d"].fn(spark, SF0001).collect()
    }
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["y"] = np.floor(ev["value"].astype(float) * 1e6)
    cut = pd.Timestamp("2024-01-16")
    for et, sub in ev.groupby("event_type"):
        a = sub.loc[pd.to_datetime(sub["ts"]) < cut, "y"].to_numpy()
        b = sub.loc[pd.to_datetime(sub["ts"]) >= cut, "y"].to_numpy()
        sp = math.sqrt(
            (a.var(ddof=0) * len(a) + b.var(ddof=0) * len(b))
            / (len(a) + len(b) - 2)
        )
        d = (a.mean() - b.mean()) / sp
        assert got[et]["n1"] == len(a) and got[et]["n2"] == len(b)
        assert abs(got[et]["cohens_d"] - d) < 1e-9, et


def test_cohens_d_degenerate_guards_cross_engine(spark, tmp_path):
    """One type with an empty second half, one with both sides
    constant: d pinned to 0 in decimal space; a shifted type reads a
    real d. Hash-matched."""
    rows = [
        (1, "2024-01-02", 1, "click", 10),
        (2, "2024-01-03", 1, "click", 20),  # n2 = 0
        (3, "2024-01-02", 2, "view", 5),
        (4, "2024-01-20", 2, "view", 5),
        (5, "2024-01-03", 2, "view", 5),
        (6, "2024-01-21", 2, "view", 5),  # both sides constant
        (7, "2024-01-02", 3, "purchase", 10),
        (8, "2024-01-03", 3, "purchase", 20),
        (9, "2024-01-20", 3, "purchase", 30),
        (10, "2024-01-21", 3, "purchase", 40),
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("stat_cohens_d", spark, sf)
    assert r.ok, str(r)
    got = {
        x["event_type"]: x
        for x in REGISTRY["stat_cohens_d"].fn(spark, sf).collect()
    }
    assert got["click"]["cohens_d"] == 0.0
    assert got["view"]["cohens_d"] == 0.0
    assert got["purchase"]["cohens_d"] != 0.0


# -- ml_lift_gains ------------------------------------------------------------


def test_lift_gains_matches_python_model(spark):
    """Every decile's exact counts and the gain/lift doubles equal a
    python replay of the rows-above decile rule on sf0.001."""
    got = {
        r["decile"]: r
        for r in REGISTRY["ml_lift_gains"].fn(spark, SF0001).collect()
    }
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["pos"] = (ev["event_type"] == "purchase").astype(int)
    n_total, p_total = len(ev), int(ev["pos"].sum())
    vals = (
        ev.groupby("value")
        .agg(c=("pos", "size"), cp=("pos", "sum"))
        .reset_index()
        .sort_values("value")
    )
    vals["fb"] = vals["c"].cumsum() - vals["c"]
    vals["dec"] = (10 * (n_total - vals["fb"] - vals["c"])) // n_total
    agg = vals.groupby("dec").agg(n=("c", "sum"), p=("cp", "sum"))
    agg["cn"] = agg["n"].cumsum()
    agg["cp2"] = agg["p"].cumsum()
    for dec, exp in agg.iterrows():
        row = got[dec]
        assert (row["n_rows"], row["n_pos"], row["cum_n"], row["cum_pos"]) == (
            exp["n"], exp["p"], exp["cn"], exp["cp2"],
        ), dec
        assert row["gain"] == float(exp["cp2"]) / float(p_total)
        assert row["lift"] == (float(exp["cp2"]) * float(n_total)) / (
            float(exp["cn"]) * float(p_total)
        )


def test_lift_gains_perfect_model_and_zero_positives(spark, tmp_path):
    """Positives all scoring at the top: decile 0 captures every
    positive (gain 1.0, lift N/cum_n). A corpus with no positives
    pins gain/lift to 0 everywhere."""
    rows = [(i, "2024-01-02", i, "purchase", 1000 + i) for i in range(5)]
    rows += [(100 + i, "2024-01-02", i, "view", i) for i in range(45)]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("ml_lift_gains", spark, sf)
    assert r.ok, str(r)
    got = {
        x["decile"]: x for x in REGISTRY["ml_lift_gains"].fn(spark, sf).collect()
    }
    assert got[0]["cum_pos"] == 5 and got[0]["gain"] == 1.0
    assert got[0]["lift"] == 50.0 / got[0]["cum_n"] * 1.0
    neg = [(i, "2024-01-02", i, "view", i) for i in range(20)]
    sf2 = _mk_sf(tmp_path / "b", events=_events(neg))
    r2 = check_query("ml_lift_gains", spark, sf2)
    assert r2.ok, str(r2)
    out = REGISTRY["ml_lift_gains"].fn(spark, sf2).collect()
    assert all(x["gain"] == 0.0 and x["lift"] == 0.0 for x in out)


# -- embeddings_kcenter_diverse ----------------------------------------------


class _PaFrame:
    """Minimal to_parquet shim so _mk_sf can write a pyarrow table
    (needed for an EMPTY embeddings frame — pandas would type the
    empty list column as DOUBLE instead of list<float>)."""

    def __init__(self, table):
        self.table = table

    def to_parquet(self, path):
        import pyarrow.parquet as pq

        pq.write_table(self.table, path)


def _emb_frame(vecs, ids=None):
    import pyarrow as pa

    ids = ids if ids is not None else list(range(len(vecs)))
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    table = pa.Table.from_pydict(
        {
            "vec_id": ids,
            "embedding": [list(map(float, v)) for v in vecs],
            "label": [0] * len(vecs),
        },
        schema=schema,
    )
    return _PaFrame(table)


def _kcenter_python(vecs, ids, k):
    import math as _m

    q = [
        [(_m.floor(float(x) * 1e6) + 2_000_000) for x in v] for v in vecs
    ]
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    first = order[0]

    def dist(a, b):
        return sum((x - y) ** 2 for x, y in zip(q[a], q[b]))

    mind = {i: dist(i, first) for i in range(len(ids))}
    trace = [(1, ids[first], 0)]
    for r in range(2, k + 1):
        best = max(range(len(ids)), key=lambda i: (mind[i], -ids[i]))
        trace.append((r, ids[best], mind[best]))
        for i in range(len(ids)):
            mind[i] = min(mind[i], dist(i, best))
    return trace


def test_kcenter_matches_python_greedy(spark):
    """The full selection trace (order, id, pick-time distance)
    equals the python farthest-point replay on the real sf0.001
    embeddings."""
    got = [
        (r["sel_order"], r["vec_id"], r["dist_q"])
        for r in REGISTRY["embeddings_kcenter_diverse"].fn(spark, SF0001).collect()
    ]
    emb = pd.read_parquet(f"{SF0001}/embeddings.parquet")
    ref = _kcenter_python(
        [list(v) for v in emb["embedding"]], emb["vec_id"].tolist(), 6
    )
    assert sorted(got) == ref


def test_kcenter_covers_spread_corners(spark, tmp_path):
    """Four well-separated cluster corners + dense filler near one
    corner: greedy must visit all four corners within the first four
    picks (the whole point of diversity sampling), cross-engine
    hash-matched."""
    corners = [
        [0.0] * 4, [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    filler = [[0.01 * i, 0.0, 0.0, 0.0] for i in range(1, 9)]
    emb = _emb_frame(corners + filler)
    sf = _mk_sf(tmp_path, embeddings=emb)
    r = check_query("embeddings_kcenter_diverse", spark, sf)
    assert r.ok, str(r)
    got = [
        x["vec_id"]
        for x in REGISTRY["embeddings_kcenter_diverse"].fn(spark, sf).collect()
    ]
    assert set(got[:4]) == {0, 1, 2, 3}


def test_kcenter_tiny_corpus_repeats_seed(spark, tmp_path):
    """Fewer points than k: once every point is selected the running
    min-distances are all 0 and the argmax tie resolves to the seed —
    deterministically on both engines."""
    emb = _emb_frame([[0.0, 0.0], [1.0, 1.0]], ids=[7, 3])
    sf = _mk_sf(tmp_path, embeddings=emb)
    r = check_query("embeddings_kcenter_diverse", spark, sf)
    assert r.ok, str(r)
    got = [
        (x["sel_order"], x["vec_id"], x["dist_q"])
        for x in REGISTRY["embeddings_kcenter_diverse"].fn(spark, sf).collect()
    ]
    assert got[0] == (1, 3, 0)
    assert got[1][1] == 7 and got[1][2] > 0
    assert all(t[1] == 3 and t[2] == 0 for t in got[2:])


def test_kcenter_empty_corpus_yields_empty(spark, tmp_path):
    """Empty embeddings: 0 rows on both engines (the oracle's COUNT
    guard and the Spark seed-None branch)."""
    emb = _emb_frame([])
    sf = _mk_sf(tmp_path, embeddings=emb)
    r = check_query("embeddings_kcenter_diverse", spark, sf)
    assert r.ok, str(r)
    assert REGISTRY["embeddings_kcenter_diverse"].fn(spark, sf).count() == 0


# -- stat_anova_f -------------------------------------------------------------


def test_anova_f_matches_python_model(spark):
    """F equals the textbook SSB/SSW replay over integer cents within
    the milli-quantization bound on the real sf0.001 corpus."""
    rows = REGISTRY["stat_anova_f"].fn(spark, SF0001).collect()
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["y"] = np.floor(ev["value"].astype(float) * 100)
    groups = [g["y"].to_numpy() for _, g in ev.groupby("event_type")]
    n_total = sum(len(g) for g in groups)
    k = len(groups)
    gm = sum(g.sum() for g in groups) / n_total
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_ref = (ssb / (k - 1)) / (ssw / (n_total - k))
    for r in rows:
        assert abs(r["f_stat"] - f_ref) / f_ref < 1e-9


def test_anova_f_single_group_and_constant_values(spark, tmp_path):
    """k = 1 hits the k <= 1 guard; all-constant values hit the
    SSW <= 0 guard — F pinned to 0 on both engines."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [(i, "2024-01-02", i, "view", 10 + i) for i in range(6)]
        ),
    )
    r = check_query("stat_anova_f", spark, sf)
    assert r.ok, str(r)
    assert all(
        x["f_stat"] == 0.0
        for x in REGISTRY["stat_anova_f"].fn(spark, sf).collect()
    )
    sf2 = _mk_sf(
        tmp_path / "b",
        events=_events(
            [(i, "2024-01-02", i, ("view", "click")[i % 2], 5) for i in range(6)]
        ),
    )
    r2 = check_query("stat_anova_f", spark, sf2)
    assert r2.ok, str(r2)
    assert all(
        x["f_stat"] == 0.0
        for x in REGISTRY["stat_anova_f"].fn(spark, sf2).collect()
    )


# -- stat_benford_digits ------------------------------------------------------


def test_benford_matches_python_model(spark):
    """Per-digit counts exact; chi2 equals the python replay within
    the micro-quantization bound (9 digits x 1e-6)."""
    rows = REGISTRY["stat_benford_digits"].fn(spark, SF0001).collect()
    od = pd.read_parquet(f"{SF0001}/orders.parquet")
    cents = np.floor(od["o_totalprice"].astype(float) * 100).astype(np.int64)
    digs = pd.Series([int(str(c)[0]) for c in cents]).value_counts().to_dict()
    total = sum(digs.values())
    chi = sum(
        (digs.get(d, 0) - total * math.log10(1 + 1 / d)) ** 2
        / (total * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    assert len(rows) == 9
    for r in rows:
        assert r["n"] == digs.get(r["digit"], 0)
        assert abs(r["chi2_stat"] - chi) <= 9e-6 + 1e-9


def test_benford_power_of_ten_boundary(spark, tmp_path):
    """Amounts exactly at powers of ten must bin to digit 1 — the
    hazard the string extraction exists to avoid (log10(1000.0) can
    read 2.999…); plus a geometric series that Benford-conforms."""
    od = pd.read_parquet(f"{SF0001}/orders.parquet").head(30).copy()
    od["o_totalprice"] = [10.0, 100.0, 1000.0, 10000.0, 100000.0] * 6
    sf = _mk_sf(tmp_path, orders=od)
    r = check_query("stat_benford_digits", spark, sf)
    assert r.ok, str(r)
    rows = {
        x["digit"]: x
        for x in REGISTRY["stat_benford_digits"].fn(spark, sf).collect()
    }
    assert rows[1]["n"] == 30
    assert all(rows[d]["n"] == 0 for d in range(2, 10))


# -- stat_gini_spend ----------------------------------------------------------


def test_gini_matches_python_exactly(spark):
    """G equals the sorted-prefix replay to the bit (the numerator is
    one exact decimal sum) on the real sf0.001 corpus."""
    row = REGISTRY["stat_gini_spend"].fn(spark, SF0001).collect()[0]
    od = pd.read_parquet(f"{SF0001}/orders.parquet")
    spend = od.groupby("o_custkey")["o_totalprice"].apply(
        lambda s: int(np.floor(s.astype(float) * 100).sum())
    )
    x = np.sort(spend.to_numpy())
    n = len(x)
    gini = float(np.sum((2 * np.arange(1, n + 1) - n - 1) * x)) / (
        float(n) * float(x.sum())
    )
    assert row["n_customers"] == n
    assert row["gini"] == gini


def test_gini_equal_and_concentrated_spend(spark, tmp_path):
    """All-equal spend gives G = 0 exactly; one customer holding all
    the spend gives the discrete maximum (n-1)/n."""
    od = pd.read_parquet(f"{SF0001}/orders.parquet").head(10).copy()
    od["o_custkey"] = list(range(10))
    od["o_totalprice"] = 500.0
    sf = _mk_sf(tmp_path, orders=od)
    r = check_query("stat_gini_spend", spark, sf)
    assert r.ok, str(r)
    row = REGISTRY["stat_gini_spend"].fn(spark, sf).collect()[0]
    assert row["gini"] == 0.0
    od["o_totalprice"] = [1000.0] + [0.0] * 9
    sf2 = _mk_sf(tmp_path / "b", orders=od)
    r2 = check_query("stat_gini_spend", spark, sf2)
    assert r2.ok, str(r2)
    row2 = REGISTRY["stat_gini_spend"].fn(spark, sf2).collect()[0]
    assert row2["gini"] == 0.9


# -- stat_power_mde -----------------------------------------------------------


def test_power_mde_matches_python_model(spark):
    """MDE and required-n equal the closed-form replay with the
    pinned normal quantiles on the real sf0.001 corpus."""
    rows = REGISTRY["stat_power_mde"].fn(spark, SF0001).collect()
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["y"] = np.floor(ev["value"].astype(float) * 100)
    zsum = 1.9599639845400545 + 0.8416212335729143
    for r in rows:
        g = ev.loc[ev["event_type"] == r["event_type"], "y"].to_numpy()
        n, half = len(g), len(g) // 2
        sd = g.std(ddof=0)
        assert r["n"] == n and r["n_per_arm"] == half
        mde = zsum * sd * math.sqrt(2 / half) / 100
        req = math.ceil(2 * zsum**2 * sd**2 / 500**2)
        assert abs(r["mde_abs"] - mde) < 1e-9
        assert r["n_per_arm_for_5"] == req


def test_power_mde_degenerate_guards(spark, tmp_path):
    """Zero-variance and tiny-n segments pin MDE/required-n to 0 on
    both engines (decided in exact decimal space)."""
    rows = [
        (1, "2024-01-02", 1, "view", 5),
        (2, "2024-01-03", 1, "view", 5),
        (3, "2024-01-04", 2, "view", 5),
        (4, "2024-01-05", 2, "view", 5),  # zero variance, n = 4
        (5, "2024-01-02", 3, "click", 1),
        (6, "2024-01-03", 3, "click", 9),
        (7, "2024-01-04", 3, "click", 5),  # n = 3 < 4 → mde guard
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("stat_power_mde", spark, sf)
    assert r.ok, str(r)
    got = {
        x["event_type"]: x
        for x in REGISTRY["stat_power_mde"].fn(spark, sf).collect()
    }
    assert got["view"]["mde_abs"] == 0.0
    assert got["view"]["n_per_arm_for_5"] == 0.0
    assert got["click"]["mde_abs"] == 0.0
    assert got["click"]["n_per_arm_for_5"] > 0  # n >= 2 and variance > 0


# -- corpus_split_leakage -----------------------------------------------------


def test_split_leakage_thresholds_match_split_assign():
    """The hardcoded split-index boundaries must equal the cumulative
    80/10/10 bucket thresholds corpus_split_assign uses."""
    from aws_etl_spark.ops.corpus import N_BUCKETS
    from aws_etl_spark.queries.corpus_queries import (
        _SPLIT_FRACTIONS,
        _split_idx_case,
    )

    case = _split_idx_case("B")
    cum = 0.0
    bounds = []
    for name in list(_SPLIT_FRACTIONS)[:-1]:
        cum += _SPLIT_FRACTIONS[name]
        bounds.append(int(cum * N_BUCKETS))
    assert f"B < {bounds[0]}" in case and f"B < {bounds[1]}" in case


def test_split_leakage_crafted_cross_split_pair(spark, tmp_path):
    """Two near-identical docs whose ids hash into different splits
    must surface as exactly one cross-split (is_leak=1) pair with the
    later-split doc counted as redundant; hash-matched."""
    import hashlib

    def split_of(doc_id: int) -> int:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
        return 0 if b < 52428 else (1 if b < 58982 else 2)

    train_id = next(i for i in range(1000) if split_of(i) == 0)
    test_id = next(i for i in range(1000) if split_of(i) == 2)
    near_dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(
        [near_dup, near_dup + " iota", "totally different words here now"],
        ["s"] * 3,
    )
    docs["doc_id"] = pd.array(
        [train_id, test_id, 999999], dtype="int64"
    )
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("corpus_split_leakage", spark, sf)
    assert r.ok, str(r)
    rows = REGISTRY["corpus_split_leakage"].fn(spark, sf).collect()
    leaks = [x for x in rows if x["is_leak"] == 1]
    assert len(leaks) == 1
    assert (leaks[0]["split_lo"], leaks[0]["split_hi"]) == ("train", "test")
    assert leaks[0]["n_pairs"] == 1 and leaks[0]["n_redundant_docs"] == 1


def test_split_leakage_within_split_counts_survivorship(spark, tmp_path):
    """Two near-dups in the SAME split: one within-split row,
    is_leak=0, redundant = the larger id only."""
    import hashlib

    def split_of(doc_id: int) -> int:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
        return 0 if b < 52428 else (1 if b < 58982 else 2)

    ids = [i for i in range(2000) if split_of(i) == 0][:2]
    near_dup = "one two three four five six seven eight"
    docs = _docs([near_dup, near_dup + " nine"], ["s"] * 2)
    docs["doc_id"] = pd.array(ids, dtype="int64")
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("corpus_split_leakage", spark, sf)
    assert r.ok, str(r)
    rows = REGISTRY["corpus_split_leakage"].fn(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["is_leak"] == 0 and rows[0]["n_redundant_docs"] == 1


# -- events_seasonal_anomaly --------------------------------------------------


def test_seasonal_anomaly_matches_python_model(spark):
    """Residuals, doubled median/MAD, and flags equal the python
    replay on the real sf0.001 corpus."""
    rows = REGISTRY["events_seasonal_anomaly"].fn(spark, SF0001).collect()
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    days = pd.to_datetime(ev["ts"]).dt.floor("D")
    cnt = days.value_counts().sort_index()
    dow = {d: d.isoweekday() for d in cnt.index}
    from collections import defaultdict

    sums, cnts = defaultdict(int), defaultdict(int)
    for d, x in cnt.items():
        sums[dow[d]] += x
        cnts[dow[d]] += 1
    r_q = {
        d: math.floor((x * cnts[dow[d]] - sums[dow[d]]) / cnts[dow[d]] * 1e6)
        for d, x in cnt.items()
    }
    vals = sorted(r_q.values())
    n = len(vals)
    med2 = vals[(n + 1) // 2 - 1] + vals[n // 2]
    d_q = {d: abs(2 * v - med2) for d, v in r_q.items()}
    dvals = sorted(d_q.values())
    mad2 = dvals[(n + 1) // 2 - 1] + dvals[n // 2]
    got = {pd.Timestamp(x["day"]): x for x in rows}
    for d in cnt.index:
        g = got[d]
        assert (g["r_q"], g["d_q"], g["med2"], g["mad2"]) == (
            r_q[d], d_q[d], med2, mad2,
        ), d
        assert g["is_anomaly"] == int(mad2 > 0 and 4 * d_q[d] > 7 * mad2)


def test_seasonal_anomaly_flags_the_wild_tuesday(spark, tmp_path):
    """Four noisy weeks + one Tuesday at ~10x its weekday level: the
    spiked day flags with the maximal deviation, and every flagged
    day is a Tuesday (the spike drags the non-robust per-dow MEAN, so
    its siblings legitimately exceed the tight MAD — the documented
    mean-based decomposition behavior). A perfectly periodic month
    (zero residuals everywhere) flags nothing via the zero-MAD
    guard."""
    def month(spike: bool):
        rows, eid = [], 0
        for week in range(4):
            for dow in range(7):
                day = 1 + week * 7 + dow
                n = 3 + dow + (week % 2)  # ±0.5 noise around the level
                if spike and week == 2 and dow == 1:
                    n = 40
                for i in range(n):
                    eid += 1
                    rows.append(
                        (eid, f"2024-01-{day:02d} 08:00:00", i, "view", 1)
                    )
        return rows

    sf = _mk_sf(tmp_path, events=_events(month(True)))
    r = check_query("events_seasonal_anomaly", spark, sf)
    assert r.ok, str(r)
    out = REGISTRY["events_seasonal_anomaly"].fn(spark, sf).collect()
    flagged = {str(x["day"])[:10] for x in out if x["is_anomaly"] == 1}
    assert "2024-01-16" in flagged
    assert all(pd.Timestamp(d).isoweekday() == 2 for d in flagged)
    spike_dq = max(x["d_q"] for x in out)
    assert next(
        x for x in out if str(x["day"])[:10] == "2024-01-16"
    )["d_q"] == spike_dq
    # perfectly periodic month: constant per-dow counts → residuals 0
    rows2, eid = [], 0
    for week in range(4):
        for dow in range(7):
            day = 1 + week * 7 + dow
            for i in range(3 + dow):
                eid += 1
                rows2.append((eid, f"2024-01-{day:02d} 08:00:00", i, "view", 1))
    sf2 = _mk_sf(tmp_path / "b", events=_events(rows2))
    r2c = check_query("events_seasonal_anomaly", spark, sf2)
    assert r2c.ok, str(r2c)
    out2 = REGISTRY["events_seasonal_anomaly"].fn(spark, sf2).collect()
    assert all(x["is_anomaly"] == 0 for x in out2)
