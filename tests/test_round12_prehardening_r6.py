"""Pre-hardening differentials for the r6-vintage names that rotate
into round 12's block 3 (the oldest-evidence tier after the 19
r5-vintage names): crafted-parquet inputs the synthetic corpus never
produces, each running the full Spark-vs-DuckDB hash comparison. The
r9/r10 pattern — next round's window should carry no known surprises.

Fixture rule (round-11 lesson): every timestamp column in a crafted
frame is written as datetime64[us] — pandas' default nanos reach
Spark as raw BIGINTs under nanosAsLong for any column that is not
the normalized events `ts`."""

from __future__ import annotations

import os

import pandas as pd

from aws_etl_spark.oracle import check_query
from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
import pytest

# Round-14 verify-budget split (r13 verdict item 1): this is one of
# the heavyweight gate suites excluded from the driver's default
# pytest run; builder gates run it via -m "slow or not slow".
pytestmark = pytest.mark.slow

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


def _orders(rows):
    """rows: (key, custkey, status, price, date, priority)."""
    return pd.DataFrame(
        {
            "o_orderkey": pd.array([r[0] for r in rows], dtype="int64"),
            "o_custkey": pd.array([r[1] for r in rows], dtype="int64"),
            "o_orderstatus": [r[2] for r in rows],
            "o_totalprice": pd.array([r[3] for r in rows], dtype="float64"),
            "o_orderdate": pd.to_datetime([r[4] for r in rows]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": [r[5] for r in rows],
        }
    )


def _lineitem(rows):
    """rows: (okey, pkey, skey, lineno, qty, price, disc, tax, rf, ls, ship)."""
    return pd.DataFrame(
        {
            "l_orderkey": pd.array([r[0] for r in rows], dtype="int64"),
            "l_partkey": pd.array([r[1] for r in rows], dtype="int64"),
            "l_suppkey": pd.array([r[2] for r in rows], dtype="int64"),
            "l_linenumber": pd.array([r[3] for r in rows], dtype="int32"),
            "l_quantity": pd.array([r[4] for r in rows], dtype="float64"),
            "l_extendedprice": pd.array([r[5] for r in rows], dtype="float64"),
            "l_discount": pd.array([r[6] for r in rows], dtype="float64"),
            "l_tax": pd.array([r[7] for r in rows], dtype="float64"),
            "l_returnflag": [r[8] for r in rows],
            "l_linestatus": [r[9] for r in rows],
            "l_shipdate": pd.to_datetime([r[10] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )


def _customer(rows):
    """rows: (key, name, nationkey, acctbal, segment)."""
    return pd.DataFrame(
        {
            "c_custkey": pd.array([r[0] for r in rows], dtype="int64"),
            "c_name": [r[1] for r in rows],
            "c_nationkey": pd.array([r[2] for r in rows], dtype="int32"),
            "c_acctbal": pd.array([r[3] for r in rows], dtype="float64"),
            "c_mktsegment": [r[4] for r in rows],
        }
    )


def _part(rows):
    """rows: (key, name, brand, type, size, price)."""
    return pd.DataFrame(
        {
            "p_partkey": pd.array([r[0] for r in rows], dtype="int64"),
            "p_name": [r[1] for r in rows],
            "p_brand": [r[2] for r in rows],
            "p_type": [r[3] for r in rows],
            "p_size": pd.array([r[4] for r in rows], dtype="int32"),
            "p_retailprice": pd.array([r[5] for r in rows], dtype="float64"),
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


def _docs(texts, n_chars=None):
    n = len(texts)
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(1, n + 1), dtype="int64"),
            "text": pd.array(texts, dtype="object"),
            "lang": ["en"] * n,
            "source": ["src0"] * n,
            "n_chars": pd.array(
                n_chars if n_chars is not None else [len(t) for t in texts],
                dtype="int64",
            ),
        }
    )


_LI_ROW = (1, 1, 1, 1, 5.0, 1000.0, 0.05, 0.02, "N", "O", "1997-03-01")


def test_agg_having_single_row_and_rollup_collapse(spark, tmp_path):
    """One lineitem row: HAVING either keeps or drops the single
    group; ROLLUP over one (flag, status) pair collapses to three
    rows. Hash-exact on both engines either way."""
    li = _lineitem([_LI_ROW])
    sf = _mk_sf(tmp_path, lineitem=li)
    assert check_query("agg_having", spark, sf).ok
    assert check_query("agg_rollup", spark, sf).ok


def test_agg_percentiles_tiny_inputs(spark, tmp_path):
    """n=1 (every percentile = the value) and n=2 (linear
    interpolation at exact halves) — the PERCENTILE_CONT seam."""
    li1 = _lineitem([_LI_ROW])
    sf = _mk_sf(tmp_path, lineitem=li1)
    assert check_query("agg_percentiles", spark, sf).ok
    li2 = _lineitem(
        [_LI_ROW, (2, 2, 2, 1, 10.0, 3000.0, 0.0, 0.0, "N", "O", "1997-03-02")]
    )
    sf2 = _mk_sf(tmp_path / "b", lineitem=li2)
    assert check_query("agg_percentiles", spark, sf2).ok


def test_set_ops_identical_and_disjoint_branches(spark, tmp_path):
    """Branch predicates fully overlapping (EXCEPT -> 0 rows) and
    fully disjoint (INTERSECT -> 0 rows) — plus UNION ALL keeping
    duplicates across identical branches."""
    # all open orders, all above every price threshold
    hi = _orders(
        [(i, i % 3, "O", 900000.0, "1997-01-10", "3-MEDIUM") for i in range(1, 7)]
    )
    sf = _mk_sf(tmp_path, orders=hi)
    for name in ("set_except", "set_intersect", "set_union_all"):
        r = check_query(name, spark, sf)
        assert r.ok, f"{name}: {r}"
    # all fulfilled cheap orders: every branch empty or disjoint
    lo = _orders(
        [(i, i % 3, "F", 10.0, "1997-01-10", "3-MEDIUM") for i in range(1, 7)]
    )
    sf2 = _mk_sf(tmp_path / "b", orders=lo)
    for name in ("set_except", "set_intersect", "set_union_all"):
        r = check_query(name, spark, sf2)
        assert r.ok, f"{name}: {r}"


def test_pivot_single_year_single_nation(spark, tmp_path):
    """All revenue in one (nation, year) cell: the pivot emits one
    column, every other nation row is absent or NULL-filled —
    NULL-vs-0 must agree across engines."""
    cust = _customer([(1, "Customer#1", 0, 100.0, "BUILDING")])
    orders = _orders(
        [(i, 1, "F", 1000.0, "1996-06-15", "3-MEDIUM") for i in range(1, 5)]
    )
    sf = _mk_sf(tmp_path, customer=cust, orders=orders)
    assert check_query("pivot_revenue_by_year", spark, sf).ok


def test_unpivot_extreme_part(spark, tmp_path):
    """Single part with zero/negative metrics unpivots to the fixed
    metric spine on both engines."""
    p = _part([(1, "odd widget", "Brand#1", "ECONOMY", 0, -1.5)])
    sf = _mk_sf(tmp_path, part=p)
    assert check_query("unpivot_part_metrics", spark, sf).ok


def test_windows_single_and_tied_partitions(spark, tmp_path):
    """lag/lead with one order per customer (every lag NULL), running
    sum over a single row, RANGE frame with keys exactly at the
    boundary distance, ranking over fully tied acctbals."""
    orders = _orders(
        [
            (100, 1, "F", 50.0, "1997-01-01", "3-MEDIUM"),
            (200, 2, "F", 60.0, "1997-02-01", "3-MEDIUM"),
            # customer 3: orderkeys exactly 100 apart — RANGE boundary
            (300, 3, "F", 70.0, "1997-03-01", "3-MEDIUM"),
            (400, 3, "F", 80.0, "1997-04-01", "3-MEDIUM"),
        ]
    )
    sf = _mk_sf(tmp_path, orders=orders)
    for name in ("window_lag_lead", "window_running_sum", "window_range_frame"):
        r = check_query(name, spark, sf)
        assert r.ok, f"{name}: {r}"
    cust = _customer(
        [(i, f"Customer#{i}", i % 2, 500.0, "BUILDING") for i in range(1, 9)]
    )
    sf2 = _mk_sf(tmp_path / "b", customer=cust)
    assert check_query("window_ranking", spark, sf2).ok


def test_tumbling_hourly_boundary_timestamps(spark, tmp_path):
    """Events exactly ON hour boundaries land in the window they
    open (inclusive start), NULL values stay out of the sum but in
    the count — both engines must agree bit-for-bit."""
    rows = [
        (1, "2024-01-15 10:00:00", 1, "view", 2.5),
        (2, "2024-01-15 10:59:59", 2, "view", 1.0),
        (3, "2024-01-15 11:00:00", 3, "view", 4.0),
        (4, "2024-01-15 11:00:00", 4, "view", None),
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("events_tumbling_hourly", spark, sf).ok


def test_seasonal_decompose_single_day(spark, tmp_path):
    """A one-day corpus: the seasonal mean IS the grand mean and the
    residual is exactly 0 — integer pairs on both engines."""
    rows = [(i, "2024-01-15 0%d:00:00" % (i % 9), i, "view", 1.0) for i in range(1, 6)]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("events_seasonal_decompose", spark, sf).ok


def test_func_string_unicode_and_empty_names(spark, tmp_path):
    """Unicode, empty, and whitespace-only customer names through the
    string-builtin surface (md5 fingerprint included)."""
    cust = _customer(
        [
            (1, "héllo wörld", 0, 1.0, "BUILDING"),
            (2, "", 1, 2.0, "AUTOMOBILE"),
            (3, "   ", 2, 3.0, "MACHINERY"),
            (4, "Ω≈ç√∫", 3, 4.0, "HOUSEHOLD"),
        ]
    )
    sf = _mk_sf(tmp_path, customer=cust)
    assert check_query("func_string", spark, sf).ok


def test_url_parse_tiny_corpus(spark, tmp_path):
    """The URL surface on a 2-doc corpus (URLs are synthesized from
    doc ids — the differential pins the synthesis + regex path on
    inputs with extreme ids)."""
    docs = _docs(["alpha beta", "gamma delta"])
    docs["doc_id"] = pd.array([1, 999999999], dtype="int64")
    sf = _mk_sf(tmp_path, documents=docs)
    assert check_query("func_url_parse", spark, sf).ok


def test_tf_idf_min_df_filters_everything(spark, tmp_path):
    """Every term df=1: min_df=2 leaves an empty result on BOTH
    engines; an all-identical corpus keeps every term with idf at the
    df=n floor."""
    sf = _mk_sf(tmp_path, documents=_docs(["aaa bbb", "ccc ddd", "eee fff"]))
    assert check_query("text_tf_idf", spark, sf).ok
    same = _docs(["same words here"] * 3)
    sf2 = _mk_sf(tmp_path / "b", documents=same)
    assert check_query("text_tf_idf", spark, sf2).ok


def test_quality_score_pathological_docs(spark, tmp_path):
    """Empty text, punctuation-only, and one-word docs through the
    composite quality heuristic."""
    docs = _docs(["", "!!! ??? ...", "word", "the the the the"])
    sf = _mk_sf(tmp_path, documents=docs)
    assert check_query("text_quality_score", spark, sf).ok


def test_sample_weighted_uniform_lengths(spark, tmp_path):
    """All docs the same n_chars: P(keep) = 1 for every row — the
    sample is the whole corpus on both engines (the boundary where
    the bucket comparison must be inclusive-consistent)."""
    docs = _docs(["abcd efgh"] * 5, n_chars=[100] * 5)
    sf = _mk_sf(tmp_path, documents=docs)
    r = check_query("sample_weighted", spark, sf)
    assert r.ok, str(r)
    assert REGISTRY["sample_weighted"].fn(spark, sf).count() == 5


def test_ab_experiment_single_user(spark, tmp_path):
    """One user: a single occupied variant and a degenerate
    conversion rate — the z/p path must survive the missing arm."""
    rows = [(i, f"2024-01-{10 + i} 01:00:00", 7, "purchase", 5.0) for i in range(1, 4)]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("stat_ab_experiment", spark, sf).ok


def test_dedup_exact_and_jaccard_uniform_corpus(spark, tmp_path):
    """All-identical docs: one exact-dedup survivor, and every pair at
    Jaccard exactly 1; sub-shingle-length docs produce no pairs."""
    same = _docs(["one two three four five six"] * 4)
    sf = _mk_sf(tmp_path, documents=same)
    assert check_query("dedup_exact", spark, sf).ok
    assert check_query("dedup_ngram_jaccard", spark, sf).ok
    tiny = _docs(["a b", "c d", "e f"])  # shorter than the 3-gram shingle
    sf2 = _mk_sf(tmp_path / "b", documents=tiny)
    assert check_query("dedup_exact", spark, sf2).ok
    assert check_query("dedup_ngram_jaccard", spark, sf2).ok


def _embs(vecs, labels):
    import numpy as np

    return pd.DataFrame(
        {
            "vec_id": pd.array(range(1, len(vecs) + 1), dtype="int64"),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": pd.array(labels, dtype="int32"),
        }
    )


def test_gram_pca_rp_degenerate_vectors(spark, tmp_path):
    """Zero vectors, a single vector, and all-identical vectors
    through the Gram matrix, PCA-by-repeated-squaring, and the JL
    random projection — rank-deficient inputs on both engines."""
    vecs = [[0.0, 0.0, 0.0, 0.0]] * 2 + [[0.5, -0.25, 0.125, 1.0]] * 3
    sf = _mk_sf(tmp_path, embeddings=_embs(vecs, [0, 0, 1, 1, 1]))
    for name in (
        "embeddings_gram_matrix",
        "embeddings_pca_power",
        "embeddings_random_projection",
    ):
        r = check_query(name, spark, sf)
        assert r.ok, f"{name}: {r}"
    one = _embs([[1.0, 2.0, 3.0, 4.0]], [0])
    sf2 = _mk_sf(tmp_path / "b", embeddings=one)
    for name in (
        "embeddings_gram_matrix",
        "embeddings_pca_power",
        "embeddings_random_projection",
    ):
        r = check_query(name, spark, sf2)
        assert r.ok, f"{name}: {r}"


def test_ivf_exact_and_semantic_exact_tiny_space(spark, tmp_path):
    """The pinned-centroid IVF twin and the SemDeDup exact twin on a
    4-vector space with exact duplicates — probe lists and prune
    sets must stay deterministic when distances tie at 0. Vectors
    honor the corpus's 64-dim contract (the IVF centroids are pinned
    64-dim literals)."""

    def v64(a, b):
        return [a, b] + [0.0] * 62

    vecs = [v64(1.0, 0.0), v64(1.0, 0.0), v64(0.0, 1.0), v64(0.7071, 0.7071)]
    sf = _mk_sf(tmp_path, embeddings=_embs(vecs, [0, 0, 1, 1]))
    for name in ("ann_cosine_topk_ivf_exact", "dedup_semantic_exact"):
        r = check_query(name, spark, sf)
        assert r.ok, f"{name}: {r}"


def test_dedup_graph_family_uniform_corpus(spark, tmp_path):
    """All-identical docs: the shingle graph is one clique — CC,
    containment, and canonical distance must agree on both engines
    (distance 0/1 rows only); a corpus with NO near-dup pairs yields
    empty cluster outputs."""
    same = _docs(["alpha beta gamma delta epsilon zeta"] * 5)
    sf = _mk_sf(tmp_path, documents=same)
    for name in (
        "dedup_clusters_cc",
        "dedup_containment",
        "dedup_canonical_distance",
    ):
        r = check_query(name, spark, sf)
        assert r.ok, f"{name}: {r}"
    distinct = _docs(
        [
            "aa bb cc dd ee ff",
            "gg hh ii jj kk ll",
            "mm nn oo pp qq rr",
        ]
    )
    sf2 = _mk_sf(tmp_path / "b", documents=distinct)
    for name in (
        "dedup_clusters_cc",
        "dedup_containment",
        "dedup_canonical_distance",
    ):
        r = check_query(name, spark, sf2)
        assert r.ok, f"{name}: {r}"


def test_textrank_single_doc_short_windows(spark, tmp_path):
    """A one-doc corpus whose length sits at the co-occurrence window
    edge, plus a doc of one repeated word (self-loops must not
    appear) — the TextRank graph degenerates gracefully."""
    docs = _docs(["alpha beta gamma", "word word word word"])
    sf = _mk_sf(tmp_path, documents=docs)
    assert check_query("text_textrank_keywords", spark, sf).ok


def test_dau_mau_and_locf_single_user_single_day(spark, tmp_path):
    """DAU/MAU with one user on one day (ratio exactly 1) and LOCF
    gapfill where the user has a single observation (nothing to
    carry) — both previously only corpus-exercised."""
    rows = [(1, "2024-01-15 01:00:00", 7, "view", 3.0)]
    sf = _mk_sf(tmp_path, events=_events(rows))
    assert check_query("events_dau_mau", spark, sf).ok
    assert check_query("events_gapfill_locf", spark, sf).ok
