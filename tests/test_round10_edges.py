"""Round-10 crafted-parquet differentials + python-model validations
for the queries added or restructured this round."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

SF0001 = "/root/testdata/sf0.001"

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _mk_sf(tmp_path, **frames) -> str:
    """Symlink sf0.001, overwrite the given tables with crafted data."""
    import os

    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for t in _TABLES:
        dst = sf / f"{t}.parquet"
        if t in frames:
            frames[t].to_parquet(str(dst))
        elif not dst.exists():
            os.symlink(f"{SF0001}/{t}.parquet", str(dst))
    return str(sf)


def _events(rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    df["value"] = df["value"].astype(float)
    df["props"] = "{}"
    return df


# -- stat_mann_whitney_by_group ----------------------------------------------


def test_mann_whitney_by_group_matches_python_model(spark):
    """Each group's (n1, n2, u2, tie_cubes, z) equals the brute-force
    pairwise U and the query's own IEEE expression order, replayed in
    python per event_type over the real sf0.001 corpus."""
    import math
    from collections import Counter

    got = {
        r["event_type"]: r
        for r in REGISTRY["stat_mann_whitney_by_group"].fn(spark, SF0001).collect()
    }
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ts = pd.to_datetime(ev["ts"])
    cut = pd.Timestamp("2024-01-16 00:00:00")
    for grp, sub in ev.groupby("event_type"):
        in1 = (ts.loc[sub.index] < cut).to_numpy()
        x = sub["value"].to_numpy()[in1]
        y = sub["value"].to_numpy()[~in1]
        u2 = sum(
            2 * int((xv > y).sum()) + int((xv == y).sum()) for xv in x
        )
        t = Counter(np.concatenate([x, y]).tolist())
        tie = sum(c**3 - c for c in t.values())
        n1, n2 = len(x), len(y)
        row = got[grp]
        assert (row["n1"], row["n2"], row["u2"], row["tie_cubes"]) == (
            n1, n2, u2, tie,
        ), grp
        N = n1 + n2
        if n1 == 0 or n2 == 0 or tie == N**3 - N:
            assert row["z_score"] == 0.0
            continue
        z = (float(u2) / 2.0 - float(n1) * float(n2) / 2.0) / math.sqrt(
            (float(n1) * float(n2) / (float(N) * float(N - 1)))
            * ((float(N) ** 3 - float(N) - float(tie)) / 12.0)
        )
        assert row["z_score"] == z, grp


def test_mann_whitney_by_group_degenerate_groups_cross_engine(spark, tmp_path):
    """One group all-tied, one group with an empty second half, one
    healthy group: per-group guards must pin z to 0 independently and
    hash-match the oracle."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-02 00:00:00", 1, "view", 42),
                (2, "2024-01-20 00:00:00", 1, "view", 42),
                (3, "2024-01-02 00:00:00", 2, "click", 10),
                (4, "2024-01-03 00:00:00", 2, "click", 20),
                (5, "2024-01-02 00:00:00", 3, "purchase", 10),
                (6, "2024-01-03 00:00:00", 3, "purchase", 30),
                (7, "2024-01-20 00:00:00", 3, "purchase", 20),
                (8, "2024-01-21 00:00:00", 3, "purchase", 40),
            ]
        ),
    )
    r = check_query("stat_mann_whitney_by_group", spark, sf)
    assert r.ok, str(r)
    rows = {
        x["event_type"]: x
        for x in REGISTRY["stat_mann_whitney_by_group"].fn(spark, sf).collect()
    }
    assert rows["view"]["z_score"] == 0.0  # all tied
    assert rows["click"]["n2"] == 0 and rows["click"]["z_score"] == 0.0
    assert rows["purchase"]["z_score"] != 0.0


# -- embeddings_pq_adc --------------------------------------------------------


def _pq_python_model(emb_rows, m=2, k=8, n_iter=2, n_queries=5, topk=3):
    """Bit-exact numpy replay of the quantized PQ pipeline (shifted
    1e-6 integer components, integer squared distances, argmin ties to
    the smallest centroid id, integer-mean updates, ADC top-k)."""
    import math

    ids = sorted(emb_rows)
    d = len(next(iter(emb_rows.values())))
    q = {
        i: [int(math.floor(float(v) * 1_000_000)) + 2_000_000 for v in emb_rows[i]]
        for i in ids
    }
    sub_of = [((j * m) // d) + 1 for j in range(d)]  # 0-based dim j
    seeds = ids[:k]
    # centroids[(sub, cluster)] = list of (dim_idx, c)
    cent = {
        (s, c): {j: q[c][j] for j in range(d) if sub_of[j] == s}
        for c in seeds
        for s in range(1, m + 1)
    }

    def assign():
        out = {}
        for i in ids:
            for s in range(1, m + 1):
                best = None
                for c in seeds:
                    dist = sum(
                        (q[i][j] - cent[(s, c)][j]) ** 2 for j in cent[(s, c)]
                    )
                    key = (dist, c)
                    if best is None or key < best:
                        best = key
                out[(i, s)] = best
        return out

    for _ in range(n_iter):
        asg = assign()
        new = {}
        for (s, c), dims in cent.items():
            members = [i for i in ids if asg[(i, s)][1] == c]
            if not members:
                new[(s, c)] = dict(dims)
            else:
                new[(s, c)] = {
                    j: sum(q[i][j] for i in members) // len(members)
                    for j in dims
                }
        cent = new
    final = assign()
    codes = {(i, s): final[(i, s)][1] for i in ids for s in range(1, m + 1)}
    rows = []
    for qi in [i for i in ids if i < n_queries]:
        qd = {
            (s, c): sum((q[qi][j] - cent[(s, c)][j]) ** 2 for j in cent[(s, c)])
            for (s, c) in cent
        }
        cands = sorted(
            (sum(qd[(s, codes[(x, s)])] for s in range(1, m + 1)), x)
            for x in ids
            if x != qi
        )
        for rn, (adc, x) in enumerate(cands[:topk], 1):
            rows.append((qi, x, adc, rn))
    return sorted(rows)


def test_pq_adc_matches_python_model(spark):
    """embeddings_pq_adc over sf0.001 equals the integer-exact numpy
    replay — train, encode, and ADC search, not just inputs."""
    emb = pd.read_parquet(f"{SF0001}/embeddings.parquet")
    rows = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    expected = _pq_python_model(rows)
    got = sorted(
        (
            int(r["query_id"]),
            int(r["neighbor_id"]),
            int(r["adc_dist_q"]),
            int(r["rank"]),
        )
        for r in REGISTRY["embeddings_pq_adc"].fn(spark, SF0001).collect()
    )
    assert got == expected


def test_pq_adc_tiny_corpus_cross_engine(spark, tmp_path):
    """Fewer vectors than centroids-with-members (empty clusters must
    persist) and duplicate vectors (distance ties broken by id):
    hash-parity on the degenerate shapes."""
    vecs = [
        [0.1] * 8,
        [0.1] * 8,  # exact duplicate -> tied ADC, id tiebreak
        [-0.2] * 8,
        [0.3] * 8,
        [0.3, -0.1] * 4,
        [0.05] * 8,
    ]
    emb = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]}
    )
    sf = _mk_sf(tmp_path, embeddings=emb)
    r = check_query("embeddings_pq_adc", spark, sf)
    assert r.ok, str(r)


# -- staged-query degenerate inputs ------------------------------------------


def _empty_events():
    df = pd.DataFrame(
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df = df.astype(
        {
            "event_id": "int64",
            "user_id": "int64",
            "event_type": "object",
            "value": "float64",
            "props": "object",
        }
    )
    df["ts"] = pd.to_datetime(df["ts"])
    return df


@pytest.mark.parametrize(
    "name",
    [
        "stat_ks_drift",
        "stat_psi_equidepth",
        "stat_psi_drift",
        "sketch_kmv_audience",
        "events_theilsen_trend",
        "stat_mann_whitney_by_group",
        "events_survival_km",
        "stat_kruskal_wallis",
    ],
)
def test_staged_queries_survive_empty_events(spark, tmp_path, name):
    """Empty base table: every staged scalar collects SQL NULL, which
    must substitute as a typed NULL literal (a repr'd None would be a
    parse error) and still hash-match the oracle's NULL-propagating
    scalar subqueries."""
    sf = _mk_sf(tmp_path, events=_empty_events())
    r = check_query(name, spark, sf)
    assert r.ok, str(r)


def test_staged_tclose_single_customer_cross_engine(spark, tmp_path):
    """One customer: one QI group, worst_t from a single row — the
    float-scalar (TCWORST) repr round-trip path."""
    cust = pd.read_parquet(f"{SF0001}/customer.parquet").head(1)
    sf = _mk_sf(tmp_path, customer=cust)
    r = check_query("privacy_t_closeness", spark, sf)
    assert r.ok, str(r)


# -- stat_kruskal_wallis ------------------------------------------------------


def test_kruskal_wallis_matches_python_model(spark):
    """(n_i, 2R_i, mean_rank, H) equal the brute-force midrank model
    replaying the query's own quantized-contribution IEEE chain."""
    import math
    from collections import Counter

    got = {
        r["event_type"]: r
        for r in REGISTRY["stat_kruskal_wallis"].fn(spark, SF0001).collect()
    }
    ev = pd.read_parquet(f"{SF0001}/events.parquet")
    ev = ev[ev["value"].notna()]
    pooled = Counter(ev["value"].tolist())
    values = sorted(pooled)
    f_below, mr2 = {}, {}
    acc = 0
    for v in values:
        f_below[v] = acc
        mr2[v] = 2 * acc + pooled[v] + 1
        acc += pooled[v]
    N = acc
    tie = sum(c**3 - c for c in pooled.values())
    sq = 0
    for grp, sub in ev.groupby("event_type"):
        cnt = Counter(sub["value"].tolist())
        n_i = sum(cnt.values())
        r2_i = sum(c * mr2[v] for v, c in cnt.items())
        row = got[grp]
        assert (row["n_i"], row["r2_i"]) == (n_i, r2_i), grp
        assert row["mean_rank"] == float(r2_i) / (2.0 * float(n_i)), grp
        sq += math.floor((float(r2_i) / 2.0) * (float(r2_i) / 2.0) / float(n_i))
    if N <= 1 or tie == N**3 - N:
        h = 0.0
    else:
        h = (
            12.0 * float(sq) / (float(N) * float(N + 1))
            - 3.0 * float(N + 1)
        ) / (1.0 - float(tie) / (float(N) ** 3 - float(N)))
    for row in got.values():
        assert row["h_stat"] == h
    # sanity vs the unquantized statistic: the floor quantization must
    # not move H by more than 12*k/(N(N+1))
    exact_sq = sum(
        (sum(c * mr2[v] for v, c in Counter(s["value"].tolist()).items()) / 2.0)
        ** 2
        / len(s)
        for _, s in ev.groupby("event_type")
    )
    h_exact = (
        12.0 * exact_sq / (N * (N + 1)) - 3.0 * (N + 1)
    ) / (1.0 - tie / (N**3 - N))
    assert abs(h - h_exact) <= 12.0 * 5 / (N * (N + 1)) + 1e-9


def test_kruskal_wallis_degenerate_cross_engine(spark, tmp_path):
    """All values tied across every group: the integer-space guard
    pins H to 0 on both engines (the unguarded form divides 0/0)."""
    sf = _mk_sf(
        tmp_path,
        events=_events(
            [
                (1, "2024-01-02 00:00:00", 1, "view", 42),
                (2, "2024-01-03 00:00:00", 2, "click", 42),
                (3, "2024-01-04 00:00:00", 3, "purchase", 42),
            ]
        ),
    )
    r = check_query("stat_kruskal_wallis", spark, sf)
    assert r.ok, str(r)
    rows = REGISTRY["stat_kruskal_wallis"].fn(spark, sf).collect()
    assert all(x["h_stat"] == 0.0 for x in rows)


def test_pq_recall_matches_python_model(spark):
    """embeddings_pq_recall equals the numpy replay: intersection of
    the ADC top-5 and the exact quantized-distance top-5 per query."""
    emb = pd.read_parquet(f"{SF0001}/embeddings.parquet")
    rows = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    import math

    ids = sorted(rows)
    q = {
        i: [int(math.floor(float(v) * 1_000_000)) + 2_000_000 for v in rows[i]]
        for i in ids
    }
    approx = {}
    for qi, nb, _adc, _rn in _pq_python_model(rows, topk=5):
        approx.setdefault(qi, set()).add(nb)
    expected = {}
    for qi in [i for i in ids if i < 5]:
        dists = sorted(
            (sum((q[qi][j] - q[x][j]) ** 2 for j in range(len(q[x]))), x)
            for x in ids
            if x != qi
        )
        exact5 = {x for _, x in dists[:5]}
        hits = len(exact5 & approx[qi])
        expected[qi] = (hits, float(hits) / 5.0)
    got = {
        int(r["query_id"]): (int(r["n_hits"]), r["recall"])
        for r in REGISTRY["embeddings_pq_recall"].fn(spark, SF0001).collect()
    }
    assert got == expected
