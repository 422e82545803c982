"""Mechanism pins for the round-7 post-checkpoint batch: RRF rank
fusion, WOE feature binning, centroid-distance outlier pruning, and
the merge-on-read changelog scan. Cross-engine hash parity is proven
by the oracle sweep; these tests pin the ALGORITHMS against
independent replays (numpy / pure Python) and the structural
contracts a green hash alone would not localize."""

from __future__ import annotations

import math

from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded, load_table


def _run(name, spark, sf_dir):
    _ensure_loaded()
    return REGISTRY[name].fn(spark, sf_dir)


# -- search_rank_fusion ----------------------------------------------------


def test_rrf_scores_recompute_from_ranks(spark, sf_dir):
    """rrf_q12 must equal the RRF formula applied to the emitted ranks
    (rank 0 = absent from that run, contributes nothing), and the
    output must be the top-20 of that recomputed ordering."""
    rows = _run("search_rank_fusion", spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        expect = 0
        for rank in (r.lex_rank, r.sem_rank):
            if rank > 0:
                expect += math.floor(1e12 / (60 + rank))
        assert r.rrf_q12 == expect, r
    scores = [r.rrf_q12 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_fuses_both_modalities(spark, sf_dir):
    """The fused top-20 must draw evidence from BOTH runs — at least
    one doc carries a lexical rank and at least one a semantic rank
    (a dead ranker would silently degrade fusion to a single run)."""
    rows = _run("search_rank_fusion", spark, sf_dir).collect()
    assert any(r.lex_rank > 0 for r in rows)
    assert any(r.sem_rank > 0 for r in rows)
    # a doc present in both runs must out-score the same doc with
    # either contribution removed
    both = [r for r in rows if r.lex_rank > 0 and r.sem_rank > 0]
    for r in both:
        assert r.rrf_q12 > math.floor(1e12 / (60 + r.lex_rank))
        assert r.rrf_q12 > math.floor(1e12 / (60 + r.sem_rank))


# -- ml_feature_binning_woe ------------------------------------------------


def test_woe_bins_are_equidepth_and_iv_recomputes(spark, sf_dir):
    """The 10 bins must each hold ~10% of orders (exact order-statistic
    edges guarantee cumulative coverage within one distinct value),
    WOE must equal the Laplace-smoothed log-odds recomputed in Python,
    and the reported IV must equal the contribution sum."""
    rows = _run("ml_feature_binning_woe", spark, sf_dir).collect()
    assert [r.bin for r in rows] == list(range(10))
    ng = sum(r.goods for r in rows)
    nb = sum(r.bads for r in rows)
    nt = ng + nb
    tot = 0
    for r in rows:
        n_bin = r.goods + r.bads
        # equi-depth: every bin within one-distinct-value tolerance of 10%
        assert abs(n_bin - nt / 10) <= max(0.02 * nt, 2), (r.bin, n_bin, nt)
        woe = math.floor(
            math.log(((r.goods + 1) * (nb + 10)) / ((r.bads + 1) * (ng + 10)))
            * 1_000_000
        )
        assert r.woe_q6 == woe, r
        dnum = (r.goods + 1) * (nb + 10) - (r.bads + 1) * (ng + 10)
        assert r.iv_contrib_q6 == dnum * woe
        tot += dnum * woe
    iv = tot / ((ng + 10) * (nb + 10)) / 1e6
    for r in rows:
        assert r.information_value == iv


# -- embeddings_outlier_prune ----------------------------------------------


def test_outlier_prune_matches_numpy_bruteforce(spark, sf_dir):
    """Top-5-per-label prune list must equal a numpy replay of the
    quantize → centroid → scaled-distance → rank pipeline."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        q = np.floor(np.array(r.embedding, dtype=np.float64) * 1e6).astype(
            object
        )  # object → exact Python ints, no int64 overflow anywhere
        by_label.setdefault(r.label, []).append((r.vec_id, q))
    expected = {}
    for label, vecs in by_label.items():
        n = len(vecs)
        s = sum(q for _, q in vecs)
        scored = sorted(
            ((int(sum((n * q - s) ** 2)), vid) for vid, q in vecs),
            key=lambda t: (-t[0], t[1]),
        )
        expected[label] = [
            (vid, rank + 1, d2) for rank, (d2, vid) in enumerate(scored[:5])
        ]
    rows = _run("embeddings_outlier_prune", spark, sf_dir).collect()
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.label, r.rnk)):
        got.setdefault(r.label, []).append((r.vec_id, r.rnk, int(r.d2_scaled)))
    assert got == expected


# -- lake_merge_on_read ----------------------------------------------------


def test_merge_on_read_resolution_semantics(spark, sf_dir):
    """Pin the three changelog behaviors the oracle hash can't
    localize: tombstoned keys are gone, 1996-active customers carry
    the seq-2 recomputed totals (upsert wins over base), and customers
    absent from the changelog keep their base rollup."""
    from pyspark.sql import functions as F

    merged = {r.custkey: r for r in _run("lake_merge_on_read", spark, sf_dir).collect()}
    assert merged, "merge produced no rows"
    assert all(k % 97 != 0 for k in merged), "tombstoned key leaked"

    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("k"),
            F.year("o_orderdate").alias("y"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
        .collect()
    )
    base, through96, active96 = {}, {}, set()
    for r in o:
        if r.y <= 1995:
            n, c = base.get(r.k, (0, 0))
            base[r.k] = (n + 1, c + r.cents)
        if r.y <= 1996:
            n, c = through96.get(r.k, (0, 0))
            through96[r.k] = (n + 1, c + r.cents)
        if r.y == 1996:
            active96.add(r.k)
    upserted = [k for k in active96 if k % 97 != 0]
    untouched = [k for k in base if k not in active96 and k % 97 != 0]
    assert upserted and untouched, "fixture lacks both behaviors"
    for k in upserted:
        assert (merged[k].n_orders, merged[k].total_cents) == through96[k]
    for k in untouched:
        assert (merged[k].n_orders, merged[k].total_cents) == base[k]
    # inserts: 1996-new customers (no base row) must appear
    inserts = [k for k in active96 if k not in base and k % 97 != 0]
    for k in inserts:
        assert k in merged


def test_ndcg_replays_from_the_run_rankings(spark, sf_dir):
    """nDCG@10 must equal a Python replay over the SAME two retrieval
    runs (executed via the shared hybrid-runs prefix), and the ten
    pinned discount literals must equal round(1e9 / log2(p+1))."""
    from aws_etl_spark.queries.llm_text import (
        _BM25_TOK_SPARK,
        _hybrid_runs_sql,
        _ndcg_weights,
    )
    from aws_etl_spark.queries.registry import register_views
    from aws_etl_spark.queries.similarity_queries import _spark_fold_dot
    from aws_etl_spark.queries.sql_seams import spark_declared

    w = _ndcg_weights()
    assert len(w) == 10
    for p, wp in enumerate(w, start=1):
        assert wp == round(1e9 / math.log2(p + 1))

    _ensure_loaded()
    register_views(spark, sf_dir)
    prefix = _hybrid_runs_sql(_BM25_TOK_SPARK, _spark_fold_dot, spark_declared)
    lex = {
        r["doc_id"]: r["lex_rank"]
        for r in spark.sql(prefix + " SELECT * FROM lex").collect()
    }
    sem = {
        r["doc_id"]: r["sem_rank"]
        for r in spark.sql(prefix + " SELECT * FROM sem").collect()
    }
    rel = {d: 11 - rk for d, rk in sem.items() if rk <= 10}
    dcg = sum(
        w[rk - 1] * rel.get(d, 0) for d, rk in lex.items() if rk <= 10
    )
    idcg = sum(w[p - 1] * (11 - p) for p in range(1, 11))
    got = (
        REGISTRY["search_eval_ndcg"].fn(spark, sf_dir).collect()[0]
    )
    assert got["dcg_q"] == dcg
    assert got["idcg_q"] == idcg
    assert got["ndcg_at_10"] == float(dcg) / float(idcg)
    assert 0.0 <= got["ndcg_at_10"] <= 1.0


def test_kmv_sketch_replays_in_pure_python(spark, sf_dir):
    """The whole KMV pipeline (32-bit md5 values, bottom-k order
    statistics, (k-1)*2^32 DIV v_k estimator, union merge, m/k
    intersection rule, small-set short-circuit) must replay exactly
    from hashlib — the property that makes this the sketch family's
    hash-provable member."""
    import hashlib

    _ensure_loaded()
    k = 12
    events = load_table(spark, sf_dir, "events")
    rows = events.select("event_type", "user_id").collect()
    h32 = lambda u: int(  # noqa: E731
        hashlib.md5(str(u).encode()).hexdigest()[:8], 16
    )
    a_users = {r["user_id"] for r in rows if r["event_type"] == "click"}
    b_users = {r["user_id"] for r in rows if r["event_type"] == "purchase"}
    a = {h32(u) for u in a_users}
    b = {h32(u) for u in b_users}
    u = a | b

    def est(s):
        sk = sorted(s)[:k]
        return len(sk) if len(sk) < k else (k - 1) * 4294967296 // max(sk)

    sk_u = sorted(u)[:k]
    m = sum(1 for h in sk_u if h in a and h in b)
    got = REGISTRY["sketch_kmv_audience"].fn(spark, sf_dir).collect()[0]
    assert got["k"] == k
    assert got["est_a"] == est(a)
    assert got["est_b"] == est(b)
    assert got["est_union"] == est(u)
    assert got["est_inter"] == m * est(u) // len(sk_u)
    assert got["est_diff_a"] == est(u) - est(b)
    assert got["est_diff_a"] >= 0
    assert got["exact_diff_a"] == len(a_users | b_users) - len(b_users)
    # ground truth is USER-space distinct counts, not hash-space —
    # hash-space "exact" would undercount by birthday collisions
    assert got["exact_a"] == len(a_users)
    assert got["exact_b"] == len(b_users)
    assert got["exact_union"] == len(a_users | b_users)
    assert got["exact_inter"] == len(a_users & b_users)


def test_dp_noise_stream_replays_in_pure_python(spark, sf_dir):
    """The Laplace release must replay exactly from hashlib + math:
    coin -> inverse CDF branch -> FLOOR(ln*1e6) quantization; the
    released value is true_count*1e6 + noise. Also pins the noise
    stream's determinism contract: same group key -> same noise on
    every run (append-stable, never re-rolled)."""
    import hashlib

    _ensure_loaded()
    rows = REGISTRY["privacy_dp_counts"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        b = int(
            hashlib.md5(f"dp:{r['c_nationkey']}".encode()).hexdigest()[:4],
            16,
        )
        if 2 * b + 1 < 65536:
            expect = math.floor(math.log((2 * b + 1) / 65536.0) * 1e6)
        else:
            expect = -math.floor(
                math.log((131071 - 2 * b) / 65536.0) * 1e6
            )
        assert r["noise_q6"] == expect
        assert (
            r["released_count_q6"]
            == r["true_count"] * 1000000 + r["noise_q6"]
        )
        assert r["epsilon"] == 1.0


def test_t_closeness_replays_in_pure_python(spark, sf_dir):
    """Bucketed t-closeness must equal a dict-based replay of the
    integer total-variation formula t = sum|c*N - C_s*n_g| / (2*n_g*N),
    including zero cells (a segment a group lacks still contributes)."""
    from collections import Counter, defaultdict

    _ensure_loaded()
    cust = load_table(spark, sf_dir, "customer").collect()
    cells: Counter = Counter()
    from decimal import ROUND_HALF_UP, Decimal

    for r in cust:
        # replay Spark's double -> DECIMAL(12,2) cast: BigDecimal of
        # the shortest repr, HALF_UP to 2 decimals
        cents = int(
            Decimal(repr(r["c_acctbal"])).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
            * 100
        )
        band = (cents + 100000) // 100000
        cells[(r["c_nationkey"], band, r["c_mktsegment"])] += 1
    glob: Counter = Counter()
    grp: Counter = Counter()
    for (nat, band, seg), c in cells.items():
        glob[seg] += c
        grp[(nat, band)] += c
    n = sum(glob.values())
    scored = {}
    for (nat, band), n_g in grp.items():
        t_num = sum(
            abs(cells.get((nat, band, seg), 0) * n - c_s * n_g)
            for seg, c_s in glob.items()
        )
        scored[(nat, band)] = (t_num, n_g)
    buckets: dict = defaultdict(lambda: [0, 0])
    for t_num, n_g in scored.values():
        t = t_num / (2.0 * n_g * n)
        k = ("<=0.10" if t <= 0.1 else "<=0.20" if t <= 0.2
             else "<=0.35" if t <= 0.35 else ">0.35")
        buckets[k][0] += 1
        buckets[k][1] += n_g
    worst = max(t_num / (2.0 * n_g * n) for t_num, n_g in scored.values())
    got = {
        r["t_bucket"]: r
        for r in REGISTRY["privacy_t_closeness"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(buckets)
    for k, (n_groups, n_rows) in buckets.items():
        assert got[k]["n_groups"] == n_groups
        assert got[k]["n_rows"] == n_rows
        assert got[k]["row_share"] == n_rows / float(n)
        assert got[k]["worst_t"] == worst
