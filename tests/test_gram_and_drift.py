"""Semantics tests for the round-6 linear-algebra and drift queries:
the quantized Gram matrix (partitioning invariance, numpy brute-force
equality, overflow contract) and the KS / PSI drift monitors (pure
Python references computed independently of either engine's SQL)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded, load_table
from aws_etl_spark.similarity.gram import gram_matrix_quantized

_ensure_loaded()


def _gram_rows(df):
    return {(r["i"], r["j"]): r["gram_q"] for r in df.collect()}


def test_gram_matches_numpy_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = _gram_rows(gram_matrix_quantized(emb))
    X = np.stack(
        [r["embedding"] for r in emb.select("embedding").collect()]
    ).astype(np.float64)
    Q = np.floor(X * 1000.0).astype(np.int64)
    G = Q.T @ Q
    d = G.shape[0]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        assert v == G[i - 1, j - 1]


def test_gram_partitioning_invariant(spark, sf_dir):
    """Integer partials make the reduction bit-exact under any
    partitioning — the property float Gram matrices lack."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = _gram_rows(gram_matrix_quantized(emb.repartition(1)))
    b = _gram_rows(gram_matrix_quantized(emb.repartition(13, "vec_id")))
    assert a == b


def test_gram_overflow_guard_raises(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(Exception, match="overflow contract"):
        gram_matrix_quantized(emb, scale=1 << 24).count()


def _event_halves(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select("ts", "value").where("value is not null").collect()
    cut = "2024-01-16 00:00:00"
    s1 = [r["value"] for r in rows if str(r["ts"]) < cut]
    s2 = [r["value"] for r in rows if str(r["ts"]) >= cut]
    return s1, s2


def test_ks_drift_matches_pure_python(spark, sf_dir):
    s1, s2 = _event_halves(spark, sf_dir)
    n1, n2 = len(s1), len(s2)
    # reference: evaluate |F1 - F2| at every distinct pooled value,
    # in cross-multiplied integer form (c1*n2 vs c2*n1)
    ks_num = 0
    for v in sorted(set(s1) | set(s2)):
        c1 = sum(1 for x in s1 if x <= v)
        c2 = sum(1 for x in s2 if x <= v)
        ks_num = max(ks_num, abs(c1 * n2 - c2 * n1))
    row = REGISTRY["stat_ks_drift"].fn(spark, sf_dir).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["ks_num"] == ks_num
    assert row["ks_x1e6"] == (ks_num * 1000000) // (n1 * n2)


def test_psi_drift_matches_pure_python(spark, sf_dir):
    s1, s2 = _event_halves(spark, sf_dir)
    n1, n2 = len(s1), len(s2)

    def bin_of(v):
        return min(int(math.floor(v / 60.0)), 9)

    c1 = {b: 0 for b in range(10)}
    c2 = {b: 0 for b in range(10)}
    for v in s1:
        c1[bin_of(v)] += 1
    for v in s2:
        c2[bin_of(v)] += 1

    rows = {r["bin"]: r for r in REGISTRY["stat_psi_drift"].fn(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(10))
    tot = 0
    for b in range(10):
        num = (c1[b] + 1) * (n2 + 10)
        den = (c2[b] + 1) * (n1 + 10)
        dnum = num - den
        ln_q6 = math.floor(math.log(num / den) * 1000000)
        r = rows[b]
        assert (r["c1"], r["c2"]) == (c1[b], c2[b])
        assert r["dnum"] == dnum
        assert r["lnratio_q6"] == ln_q6
        assert r["contrib_q6"] == dnum * ln_q6
        tot += dnum * ln_q6
    psi = float(tot) / ((n1 + 10) * (n2 + 10)) / 1e6
    assert rows[0]["psi"] == pytest.approx(psi, rel=0, abs=0)
    assert not math.isnan(rows[0]["psi"])


def test_psi_empty_bins_present_and_smoothed(spark, sf_dir):
    """sf0.001 events top out at ~327, so bins 6..9 are empty — the
    spine join must still emit them with the smoothed contribution."""
    rows = {r["bin"]: r for r in REGISTRY["stat_psi_drift"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(range(10))
    empty = [b for b in range(10) if rows[b]["c1"] == 0 and rows[b]["c2"] == 0]
    for b in empty:
        # (0+1)(n2+10) vs (0+1)(n1+10): pure smoothing mass
        assert rows[b]["contrib_q6"] == rows[b]["dnum"] * rows[b]["lnratio_q6"]


def _collect_X(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return rows, np.stack([r["embedding"] for r in rows]).astype(np.float64)


def _numpy_pca_replay(X, squarings=10):
    from aws_etl_spark.similarity.pca import V_SCALE

    Q = np.floor(X * 1000.0).astype(np.int64)
    G = Q.T @ Q

    def norm_q(M):
        m = np.abs(M).max()
        if m == 0:
            return np.zeros_like(M)
        return np.floor(M.astype(np.float64) / float(m) * V_SCALE).astype(
            np.int64
        )

    M = norm_q(G)
    for _ in range(squarings):
        M = norm_q(M @ M)
    return norm_q(M @ np.full(G.shape[0], V_SCALE, dtype=np.int64))


def test_pca_power_matches_pure_python(spark, sf_dir):
    """The quantized squaring chain is a pure function of the integer
    Gram matrix — replay it in numpy and demand exact equality."""
    from aws_etl_spark.similarity.pca import pca_power_component

    _, X = _collect_X(spark, sf_dir)
    v = _numpy_pca_replay(X)
    emb = load_table(spark, sf_dir, "embeddings")
    got = {r["dim"]: r["component_q6"] for r in pca_power_component(emb).collect()}
    assert got == {i + 1: int(v[i]) for i in range(len(v))}


def test_pca_direction_matches_numpy_eig(spark, sf_dir):
    """10 squarings ~ 1024 power steps: enough to converge even on
    the near-isotropic test spectra (gap ratio as low as 1.017)."""
    from aws_etl_spark.similarity.pca import pca_power_component

    _, X = _collect_X(spark, sf_dir)
    G = X.T @ X
    evals, evecs = np.linalg.eigh(G)
    top = evecs[:, -1]
    emb = load_table(spark, sf_dir, "embeddings")
    got = {r["dim"]: r["component_q6"] for r in pca_power_component(emb).collect()}
    v = np.array([got[i + 1] for i in range(len(top))], dtype=np.float64)
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999


def _md5_sign(t: int, i: int) -> int:
    import hashlib

    h = hashlib.md5(f"{t}_{i}".encode()).hexdigest()
    return 1 if int(h[:4], 16) % 2 == 0 else -1


def test_random_projection_matches_pure_python(spark, sf_dir):
    from aws_etl_spark.queries.registry import REGISTRY

    rows, X = _collect_X(spark, sf_dir)
    Q = np.floor(X * 1000.0).astype(np.int64)
    d = Q.shape[1]
    S = np.array(
        [[_md5_sign(t, i + 1) for t in range(16)] for i in range(d)],
        dtype=np.int64,
    )
    Y = Q @ S
    got = {
        (r["vec_id"], r["t"]): r["y_q"]
        for r in REGISTRY["embeddings_random_projection"].fn(spark, sf_dir).collect()
    }
    for ridx, r in enumerate(rows):
        for t in range(16):
            assert got[(r["vec_id"], t)] == Y[ridx, t]


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL contract: squared distances in the k=16 +-1 projection
    concentrate around k * the original squared distance. Data and
    signs are fixed, so the bound is deterministic, not flaky."""
    from aws_etl_spark.queries.registry import REGISTRY

    rows, X = _collect_X(spark, sf_dir)
    Q = np.floor(X * 1000.0).astype(np.float64)
    proj = REGISTRY["embeddings_random_projection"].fn(spark, sf_dir).collect()
    by_vec: dict = {}
    for r in proj:
        by_vec.setdefault(r["vec_id"], {})[r["t"]] = r["y_q"]
    ids = [r["vec_id"] for r in rows[:20]]
    Y = np.array(
        [[by_vec[v][t] for t in range(16)] for v in ids], dtype=np.float64
    )
    ratios = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            orig = float(((Q[a] - Q[b]) ** 2).sum())
            prj = float(((Y[a] - Y[b]) ** 2).sum()) / 16.0
            if orig > 0:
                ratios.append(prj / orig)
    med = float(np.median(np.array(ratios)))
    assert 0.5 < med < 2.0


def test_pca_oracle_builder_alternate_parameterization(spark, sf_dir):
    """pca_power_oracle_sql must mirror pca_power_component for ANY
    (scale, squarings), not just the registered (1000, 10) — pin a
    second parameterization end-to-end through DuckDB so a future
    edit to either side can't silently specialize them."""
    import duckdb

    from aws_etl_spark.similarity.pca import (
        pca_power_component,
        pca_power_oracle_sql,
    )

    emb_path = f"{sf_dir}/embeddings.parquet"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_path}'")
    ora = {
        r[0]: r[1]
        for r in con.sql(pca_power_oracle_sql(scale=500, squarings=3)).fetchall()
    }
    emb = spark.read.parquet(emb_path)
    got = {
        r["dim"]: r["component_q6"]
        for r in pca_power_component(emb, scale=500, squarings=3).collect()
    }
    assert got == ora


def test_cusum_matches_direct_recurrence(spark, sf_dir):
    """The windowed identity (prefix sum minus running extremum) must
    equal the textbook recurrence S_k = max(0, S_{k-1} + e_k) computed
    directly — pin the identity, not just the SQL."""
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    from collections import Counter

    days = Counter(str(r["ts"])[:10] for r in ev)
    series = sorted(days.items())
    total = sum(x for _, x in series)
    nd = len(series)
    s_pos = s_neg = 0
    expect = []
    for day, x in series:
        e = x * nd - total
        s_pos = max(0, s_pos + e)
        s_neg = max(0, s_neg - e)
        expect.append((day, x, e, s_pos, s_neg))
    rows = sorted(
        REGISTRY["events_cusum_changepoint"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) == nd
    for row, (day, x, e, sp, sn) in zip(rows, expect):
        assert str(row["day"])[:10] == day
        assert (row["x"], row["e_q"]) == (x, e)
        assert row["cusum_pos_q"] == sp
        assert row["cusum_neg_q"] == sn
        assert row["alarm"] == (1 if sp > 2 * total or sn > 2 * total else 0)


def test_new_op_plan_discipline(spark, sf_dir):
    """Plan shapes that make the r6 ops scale: the Gram reduction is
    ONE exchange with zero joins (the kernel folds before shuffling);
    the JL projection broadcasts its sign table; the Heaps spine
    decorrelates to broadcast joins — no SortMergeJoin anywhere."""
    from aws_etl_spark.plans import formatted_plan

    gram = formatted_plan(REGISTRY["embeddings_gram_matrix"].fn(spark, sf_dir))
    assert gram.count("+- Exchange") == 1, gram
    assert "Join" not in gram, gram

    rp = formatted_plan(
        REGISTRY["embeddings_random_projection"].fn(spark, sf_dir)
    )
    assert "BroadcastHashJoin" in rp, rp
    assert "SortMergeJoin" not in rp, rp

    heaps = formatted_plan(REGISTRY["text_heaps_law"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in heaps, heaps


def test_ab_experiment_matches_pure_python(spark, sf_dir):
    """Replay hash assignment, conversion, and the 2x2 chi-square in
    pure Python (identical IEEE expression order) — exact equality."""
    import hashlib

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    purchases: dict = {}
    for r in ev:
        u = r["user_id"]
        purchases[u] = purchases.get(u, 0) + (
            1 if r["event_type"] == "purchase" else 0
        )
    stats = {0: [0, 0], 1: [0, 0]}  # variant -> [users, converters]
    for u, np_ in purchases.items():
        v = int(hashlib.md5(f"exp1:{u}".encode()).hexdigest()[:4], 16) % 2
        stats[v][0] += 1
        stats[v][1] += 1 if np_ >= 14 else 0
    a, b = stats[0][1], stats[0][0] - stats[0][1]
    c, d = stats[1][1], stats[1][0] - stats[1][1]
    chi2_micros = math.floor(
        float(a + b + c + d)
        * (float(a) * float(d) - float(b) * float(c))
        * (float(a) * float(d) - float(b) * float(c))
        / (float(a + b) * float(c + d) * float(a + c) * float(b + d))
        * 1000000
    )
    rows = sorted(
        REGISTRY["stat_ab_experiment"].fn(spark, sf_dir).collect(),
        key=lambda r: r["variant"],
    )
    assert len(rows) == 2
    for row in rows:
        v = row["variant"]
        assert (row["users"], row["converters"]) == tuple(stats[v])
        assert row["conversion_micros"] == math.floor(
            float(stats[v][1]) / float(stats[v][0]) * 1000000
        )
        assert row["chi2_micros"] == chi2_micros
        assert row["significant_95"] == (1 if chi2_micros > 3841459 else 0)


def test_seasonal_decompose_identity_holds_exactly(spark, sf_dir):
    """The decomposition must reassemble the observation exactly in
    integer arithmetic: x*days*cnt_dow == total*cnt_dow + seasonal_num
    + resid_num*days for every day."""
    rows = REGISTRY["events_seasonal_decompose"].fn(spark, sf_dir).collect()
    assert len(rows) == 30
    for r in rows:
        lhs = r["x"] * r["days"] * r["cnt_dow"]
        rhs = (
            r["total"] * r["cnt_dow"]
            + r["seasonal_num"]
            + r["resid_num"] * r["days"]
        )
        assert lhs == rhs, r
        # convenience doubles are the same integers divided once
        assert r["dow_mean"] == r["sum_dow"] / r["cnt_dow"]
        assert r["residual"] == r["resid_num"] / r["cnt_dow"]
    # every ISO dow 1..7 appears, and cnt_dow-weighted seasonal
    # components sum to exactly zero (one seasonal_num per dow; the
    # common denominator days*cnt_dow cancels in the weighted sum)
    per_dow = {r["dow"]: r["seasonal_num"] for r in rows}
    assert set(per_dow) == set(range(1, 8))
    assert sum(per_dow.values()) == 0


def test_psi_equidepth_matches_pure_python(spark, sf_dir):
    """Replay the order-statistic edges and binning in pure Python;
    baseline bins must each hold ~10% of the baseline by construction."""
    s1, s2 = _event_halves(spark, sf_dir)
    n1, n2 = len(s1), len(s2)
    s1_sorted = sorted(s1)
    # edge_k = ceil(k*n1/10)-th smallest baseline value (1-indexed)
    edges = [s1_sorted[(k * n1 + 9) // 10 - 1] for k in range(1, 10)]

    def bin_of(v):
        return sum(1 for e in edges if e < v)

    c1 = {b: 0 for b in range(10)}
    c2 = {b: 0 for b in range(10)}
    for v in s1:
        c1[bin_of(v)] += 1
    for v in s2:
        c2[bin_of(v)] += 1
    rows = {
        r["bin"]: r
        for r in REGISTRY["stat_psi_equidepth"].fn(spark, sf_dir).collect()
    }
    assert sorted(rows) == list(range(10))
    tot = 0
    for b in range(10):
        num = (c1[b] + 1) * (n2 + 10)
        den = (c2[b] + 1) * (n1 + 10)
        dnum = num - den
        ln_q6 = math.floor(math.log(num / den) * 1000000)
        r = rows[b]
        assert (r["c1"], r["c2"]) == (c1[b], c2[b]), (b, r)
        assert r["dnum"] == dnum
        assert r["lnratio_q6"] == ln_q6
        assert r["contrib_q6"] == dnum * ln_q6
        tot += dnum * ln_q6
    psi = float(tot) / ((n1 + 10) * (n2 + 10)) / 1e6
    assert rows[0]["psi"] == pytest.approx(psi, rel=0, abs=0)
    # equi-depth contract: every baseline bin holds n1/10 +- the
    # tie-mass at its edges (values equal to an edge sort below it)
    for b in range(10):
        assert c1[b] >= 1  # never empty on the baseline side
    assert max(c1.values()) - min(c1.values()) <= max(3, n1 // 20)


def test_textrank_matches_quantized_pagerank_replay(spark, sf_dir):
    """TextRank = skip-gram edges + integer PageRank: replay both in
    pure Python from the collected docs and demand exact equality."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    edges = set()
    for r in docs:
        words = [w for w in r["text"].lower().split() if w != ""]
        for i, wa in enumerate(words):
            for j in (i + 1, i + 2):
                if j < len(words) and words[j] != wa:
                    edges.add((min(wa, words[j]), max(wa, words[j])))
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    deg = {}
    for u, _ in sym:
        deg[u] = deg.get(u, 0) + 1
    n = len(deg)
    q = 10**12
    teleport = ((100 - 85) * q) // (100 * n)
    rank = {u: q // n for u in deg}
    for _ in range(10):
        contrib = {u: 0 for u in deg}
        for u, v in sym:
            contrib[v] += rank[u] // deg[u]
        rank = {u: teleport + (85 * contrib[u]) // 100 for u in deg}
    expect = sorted(rank.items(), key=lambda t: (-t[1], t[0]))[:20]
    got = [
        (r["word"], r["rank_q"], r["degree"])
        for r in REGISTRY["text_textrank_keywords"].fn(spark, sf_dir).collect()
    ]
    assert [(w, rq) for w, rq, _ in got] == expect
    for w, _, d in got:
        assert d == deg[w]


def test_canonical_distance_matches_bfs_replay(spark, sf_dir):
    """8 min-propagation iterations must converge on the test graph:
    canonical_id == the component's min doc_id, hops == the true BFS
    distance from that canonical node (independent Python BFS)."""
    from collections import deque

    from aws_etl_spark.dedup.jaccard import ngram_jaccard_pairs
    from aws_etl_spark.queries.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = [
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
        .select("id_a", "id_b")
        .collect()
    ]
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # components + BFS from each component's min node
    seen, expect = set(), {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, q = {start}, deque([start])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in comp:
                    comp.add(v)
                    q.append(v)
        seen |= comp
        root = min(comp)
        dist = {root: 0}
        q = deque([root])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for u in comp:
            expect[u] = (root, dist[u])
    got = {
        r["doc_id"]: (r["canonical_id"], r["hops"])
        for r in REGISTRY["dedup_canonical_distance"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_fisher_separation_matches_numpy(spark, sf_dir):
    """The division-free DECIMAL algebra equals the definitional
    Fisher ratio computed by numpy on the same quantized components
    (exact integers -> the only rounding is the one output division,
    so agreement is to double precision, not a loose tolerance)."""
    _ensure_loaded()
    got = {
        r["d"]: r["fisher_ratio"]
        for r in REGISTRY["embeddings_fisher_separation"]
        .fn(spark, sf_dir)
        .collect()
    }
    emb = load_table(spark, sf_dir, "embeddings").collect()
    X = {
        lab: np.floor(
            np.stack([r["embedding"] for r in emb if r["label"] == lab])
            .astype(np.float64) * 1000.0
        ).astype(np.int64)
        for lab in (0, 1)
    }
    a, b = X[0], X[1]
    na, nb = len(a), len(b)
    for d in range(1, a.shape[1] + 1):
        qa, qb = a[:, d - 1], b[:, d - 1]
        num = float(int(qa.sum()) * nb - int(qb.sum()) * na) ** 2
        den = float(
            nb * nb * (na * int((qa * qa).sum()) - int(qa.sum()) ** 2)
            + na * na * (nb * int((qb * qb).sum()) - int(qb.sum()) ** 2)
        )
        expect = 0.0 if den == 0 else num / den
        assert got[d] == pytest.approx(expect, rel=1e-12, abs=1e-300)
