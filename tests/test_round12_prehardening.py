"""PRE-HARDENING differentials for round-12's re-confirmation block:
the 19 remaining r5-vintage names (registry.py tail comment) rotate
into the round-12 driver window, and none of them had crafted-parquet
edge differentials — their evidence is oracle hashes on the synthetic
corpus only. Each test here runs the full Spark-vs-DuckDB hash
comparison on inputs the corpus never produces (the r9→r10→r11
pattern the verdict endorsed), so that window carries no known
surprises either."""

from __future__ import annotations

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


def _lineitem(rows):
    """rows: (orderkey, partkey, suppkey, linenumber, qty, price,
    disc, flag, status); flag/status may be None."""
    return pd.DataFrame(
        {
            "l_orderkey": pd.array([r[0] for r in rows], dtype="int64"),
            "l_partkey": pd.array([r[1] for r in rows], dtype="Int64"),
            "l_suppkey": pd.array([r[2] for r in rows], dtype="Int64"),
            "l_linenumber": pd.array([r[3] for r in rows], dtype="int32"),
            "l_quantity": pd.array([r[4] for r in rows], dtype="float64"),
            "l_extendedprice": pd.array([r[5] for r in rows], dtype="float64"),
            "l_discount": pd.array([r[6] for r in rows], dtype="float64"),
            "l_tax": pd.array([0.01] * len(rows), dtype="float64"),
            "l_returnflag": pd.array([r[7] for r in rows], dtype="string"),
            "l_linestatus": pd.array([r[8] for r in rows], dtype="string"),
            "l_shipdate": pd.to_datetime(["1996-03-13"] * len(rows)),
        }
    )


def _orders(rows):
    """rows: (orderkey, custkey, status, totalprice, priority);
    custkey nullable."""
    return pd.DataFrame(
        {
            "o_orderkey": pd.array([r[0] for r in rows], dtype="int64"),
            "o_custkey": pd.array([r[1] for r in rows], dtype="Int64"),
            "o_orderstatus": pd.array([r[2] for r in rows], dtype="object"),
            "o_totalprice": pd.array([r[3] for r in rows], dtype="float64"),
            "o_orderdate": pd.to_datetime(["1997-01-15"] * len(rows)),
            "o_orderpriority": pd.array([r[4] for r in rows], dtype="object"),
        }
    )


def _customer(rows):
    """rows: (custkey, name, nationkey, segment)."""
    return pd.DataFrame(
        {
            "c_custkey": pd.array([r[0] for r in rows], dtype="int64"),
            "c_name": pd.array([r[1] for r in rows], dtype="object"),
            "c_nationkey": pd.array([r[2] for r in rows], dtype="int32"),
            "c_acctbal": pd.array([100.0] * len(rows), dtype="float64"),
            "c_mktsegment": pd.array([r[3] for r in rows], dtype="object"),
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


def _docs(texts):
    return pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": pd.array(texts, dtype="string"),
            "lang": pd.array(["en"] * len(texts), dtype="string"),
            "source": pd.array(
                [f"src{i % 2}" for i in range(len(texts))], dtype="string"
            ),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )


# -- aggregation family -------------------------------------------------------


def test_cube_with_data_nulls(spark, tmp_path):
    """DATA NULLs in both cube dimensions: the COALESCE(x,'ALL')
    rendering conflates a data-NULL group with the subtotal row on
    BOTH engines identically — the exact conflation agg_grouping_flags
    exists to disambiguate, pinned here as hash-stable."""
    li = _lineitem(
        [
            (1, 1, 1, 1, 10.0, 100.0, 0.01, None, "O"),
            (2, 1, 1, 1, 20.0, 200.0, 0.02, "R", None),
            (3, 1, 1, 1, 30.0, 300.0, 0.03, None, None),
            (4, 1, 1, 1, 40.0, 400.0, 0.04, "A", "F"),
        ]
    )
    sf = _mk_sf(tmp_path, lineitem=li)
    assert check_query("agg_cube", spark, sf).ok


def test_cube_empty_table_seam_and_plain_groupby_empty(spark, tmp_path):
    """PINNED DIALECT SEAM (found by this differential): GROUP BY
    CUBE/ROLLUP/GROUPING SETS over an EMPTY table — DuckDB emits the
    SQL-standard grand-total row for the () grouping set (('ALL',
    'ALL', 0)), while Spark's expanded aggregate emits NOTHING. The
    corpus never ships empty base tables, so the oracle contract
    holds everywhere the driver tests; this pin keeps the divergence
    visible. Plain GROUP BY <key> over empty input agrees (0 rows)."""
    sf = _mk_sf(tmp_path, lineitem=_lineitem([]))
    r = check_query("agg_cube", spark, sf)
    assert not r.rows_match  # the pinned empty-input seam
    assert (r.rows_spark, r.rows_oracle) == (0, 1)
    # non-cube aggregates agree on empty input
    assert check_query("agg_group_by_all", spark, sf).ok
    assert check_query("agg_filter_clause", spark, sf).ok


def test_grouping_sets_with_data_nulls(spark, tmp_path):
    """Data NULLs in both orders dimensions + a single surviving
    group per set."""
    o = _orders(
        [
            (1, 1, None, 10.0, "1-URGENT"),
            (2, 2, "F", 20.0, None),
            (3, 3, None, 30.0, None),
        ]
    )
    sf = _mk_sf(tmp_path, orders=o)
    assert check_query("agg_grouping_sets", spark, sf).ok


def test_distinct_counts_null_keys_and_prices(spark, tmp_path):
    """NULL custkeys are ignored by COUNT(DISTINCT); an all-NULL
    price group yields NULL min/max identically on both engines."""
    o = _orders(
        [
            (1, None, "F", None, "1-URGENT"),
            (2, None, "F", None, "1-URGENT"),
            (3, 5, "F", 10.0, "2-HIGH"),
            (4, 5, "F", 20.0, "2-HIGH"),
            (5, 6, "F", None, "2-HIGH"),
        ]
    )
    sf = _mk_sf(tmp_path, orders=o)
    assert check_query("agg_distinct_counts", spark, sf).ok


def test_filter_clause_boundary_and_empty_filter(spark, tmp_path):
    """Quantity exactly 25 and discount exactly 0.05 sit ON the
    FILTER boundaries (strict >): excluded on both engines; a group
    where nothing passes yields NULL disc_rev."""
    li = _lineitem(
        [
            (1, 1, 1, 1, 25.0, 100.0, 0.05, "A", "F"),
            (2, 1, 1, 1, 25.0, 200.0, 0.05, "A", "F"),
            (3, 1, 1, 1, 26.0, 300.0, 0.06, "R", "O"),
        ]
    )
    sf = _mk_sf(tmp_path, lineitem=li)
    assert check_query("agg_filter_clause", spark, sf).ok


def test_group_by_all_null_keys(spark, tmp_path):
    """GROUP BY ALL with NULLs in both inferred keys: NULL groups
    group together (SQL grouping semantics) on both engines."""
    li = _lineitem(
        [
            (1, 1, 1, 1, 1.0, 10.0, 0.0, None, "O"),
            (2, 1, 1, 1, 2.0, 20.0, 0.0, None, "O"),
            (3, 1, 1, 1, 3.0, 30.0, 0.0, "R", None),
        ]
    )
    sf = _mk_sf(tmp_path, lineitem=li)
    assert check_query("agg_group_by_all", spark, sf).ok


# -- join family --------------------------------------------------------------


def test_anti_semi_all_and_none(spark, tmp_path):
    """Every customer has an order (anti = empty) and none are
    URGENT (semi = empty); NULL o_custkey rows never match either."""
    c = _customer([(1, "a", 0, "AUTOMOBILE"), (2, "b", 0, "BUILDING")])
    o = _orders(
        [
            (10, 1, "F", 10.0, "2-HIGH"),
            (11, 2, "F", 20.0, "3-MEDIUM"),
            (12, None, "F", 30.0, "1-URGENT"),
        ]
    )
    sf = _mk_sf(tmp_path, customer=c, orders=o)
    assert check_query("join_anti", spark, sf).ok
    assert check_query("join_semi", spark, sf).ok
    r = REGISTRY["join_anti"].fn(spark, sf)
    assert r.count() == 0


def test_full_outer_boundary_and_one_sided(spark, tmp_path):
    """Price exactly 30000 goes to the <= side (strict > on the high
    side); customers existing on only one side null-extend."""
    o = _orders(
        [
            (1, 1, "F", 30000.0, "2-HIGH"),   # boundary: low side
            (2, 2, "F", 30000.01, "2-HIGH"),  # high side only
            (3, 3, "F", 1.0, "2-HIGH"),       # low side only
            (4, 4, "F", 50000.0, "2-HIGH"),
            (5, 4, "F", 2.0, "2-HIGH"),       # customer 4: both sides
        ]
    )
    sf = _mk_sf(tmp_path, orders=o)
    assert check_query("join_full_outer", spark, sf).ok


def test_composite_key_null_keys_multiplication(spark, tmp_path):
    """NULL composite-key components never match (left rows
    null-extend); an all-R right side multiplies every matching left
    row by the full duplicate count."""
    li = _lineitem(
        [
            (1, 7, 7, 1, 1.0, 10.0, 0.0, "R", "F"),
            (2, 7, 7, 1, 2.0, 20.0, 0.0, "R", "F"),
            (3, 7, 7, 2, 3.0, 30.0, 0.0, "R", "F"),
            (4, None, 7, 1, 4.0, 40.0, 0.0, "N", "O"),
            (5, 7, None, 1, 5.0, 50.0, 0.0, "N", "O"),
        ]
    )
    sf = _mk_sf(tmp_path, lineitem=li)
    r = check_query("join_composite_key", spark, sf)
    assert r.ok, str(r)
    # rows 1-3 each match the 3 R-rows at (7,7); NULL keys extend once
    assert r.rows_spark == 3 * 3 + 2


def test_inner_multiway_no_matching_region(spark, tmp_path):
    """No ASIA region at all: the 5-way chain returns zero rows on
    both engines (schema intact)."""
    reg = pd.DataFrame(
        {
            "r_regionkey": pd.array([0, 1], dtype="int32"),
            "r_name": pd.array(["EUROPE", "AFRICA"], dtype="object"),
        }
    )
    sf = _mk_sf(tmp_path, region=reg)
    r = check_query("join_inner_multiway", spark, sf)
    assert r.ok and r.rows_spark == 0


def test_fuzzy_blocked_tiny_names(spark, tmp_path):
    """Single-character names inside one block: the SymSpell
    deletion-variant join must agree with the naive quadratic oracle
    on every lev<=2 pair, including the empty-string variants
    single-char names generate."""
    c = _customer(
        [
            (1, "a", 0, "AUTOMOBILE"),
            (2, "b", 0, "AUTOMOBILE"),          # lev(a,b)=1
            (3, "ab", 0, "AUTOMOBILE"),          # lev vs both = 1
            (5, "hello", 0, "AUTOMOBILE"),
            (6, "hellooo", 0, "AUTOMOBILE"),     # lev vs hello = 2
            (7, "unrelated-name-x", 1, "AUTOMOBILE"),  # other block
        ]
    )
    sf = _mk_sf(tmp_path, customer=c)
    r = check_query("join_fuzzy_blocked", spark, sf)
    assert r.ok, str(r)
    assert r.rows_spark >= 4


def test_fuzzy_blocked_levenshtein_byte_vs_codepoint_seam(spark, tmp_path):
    """PINNED DIALECT SEAM (found by this differential): Spark's
    levenshtein counts unicode CODEPOINTS while DuckDB's counts
    BYTES — lev('héllo','hello') is 1 on Spark but 2 on DuckDB (é is
    two UTF-8 bytes). The oracle parity contract for
    join_fuzzy_blocked therefore holds on single-byte (ASCII) names —
    true of the TPC-H-style corpus — and this test pins the
    divergence so a future refactor cannot silently 'fix' one side:
    the engine (codepoint semantics, the standard definition) reports
    edit_dist 1 and keeps the pair; the byte-counting oracle reports
    2 — still <= 2, so the PAIR SET matches and only the distance
    value differs."""
    c = _customer(
        [
            (4, "héllo", 0, "AUTOMOBILE"),
            (5, "hello", 0, "AUTOMOBILE"),
        ]
    )
    sf = _mk_sf(tmp_path, customer=c)
    r = check_query("join_fuzzy_blocked", spark, sf)
    assert r.rows_match and r.cols_match
    assert not r.values_match  # the pinned byte-vs-codepoint seam
    assert "héllo|5|hello|1" in (r.first_diff or "")
    assert "héllo|5|hello|2" in (r.first_diff or "")
    got = REGISTRY["join_fuzzy_blocked"].fn(spark, sf).collect()
    assert len(got) == 1 and got[0].edit_dist == 1  # codepoint semantics


def test_range_overlap_point_intervals(spark, tmp_path):
    """Single-event users have zero-length intervals [t, t]: under
    the strict predicate (a.start < b.end AND b.start < a.end) a
    point interval DOES overlap an interval strictly containing its
    instant, but two point intervals at the same instant do NOT
    (10 < 10 fails). Identical non-degenerate intervals overlap."""
    rows = [
        (1, "2024-01-05 10:00:00", 1, "view", 1.0),   # point interval
        (2, "2024-01-05 09:00:00", 2, "view", 1.0),
        (3, "2024-01-05 11:00:00", 2, "view", 1.0),   # [9,11] contains 10
        (4, "2024-01-05 09:00:00", 3, "view", 1.0),
        (5, "2024-01-05 11:00:00", 3, "view", 1.0),   # identical to user 2
        (6, "2024-01-05 10:00:00", 4, "view", 1.0),   # same point as user 1
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("join_range_overlap", spark, sf)
    assert r.ok, str(r)
    got = {
        (x.l_id, x.r_id)
        for x in REGISTRY["join_range_overlap"].fn(spark, sf).collect()
    }
    # points inside [9,11] overlap it; the two coincident points
    # do not overlap each other
    assert got == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)}


def test_asof_join_boundary_and_no_prior(spark, tmp_path):
    """Signup at the EXACT purchase timestamp matches (<=); a
    purchase before any signup null-extends; the latest of several
    prior signups wins."""
    rows = [
        (1, "2024-01-02 10:00:00", 1, "purchase", 5.0),   # no prior signup
        (2, "2024-01-03 10:00:00", 1, "signup", None),
        (3, "2024-01-03 10:00:00", 1, "purchase", 6.0),   # boundary: equal ts
        (4, "2024-01-04 09:00:00", 1, "signup", None),
        (5, "2024-01-05 10:00:00", 1, "purchase", 7.0),   # latest prior = 4
        (6, "2024-01-01 00:00:00", 2, "signup", None),
    ]
    sf = _mk_sf(tmp_path, events=_events(rows))
    r = check_query("events_asof_join", spark, sf)
    assert r.ok, str(r)
    got = {
        x.event_id: x.asof_signup_event
        for x in REGISTRY["events_asof_join"].fn(spark, sf).collect()
    }
    assert got == {1: None, 3: 2, 5: 4}


# -- recursive / ANN / BPE ----------------------------------------------------


def test_recursive_reachability_tiny_graph(spark, tmp_path):
    """A 3-nation graph: the functional edge map (2k+7)%25 mostly
    points at missing nodes, so the walk from 0 terminates early —
    the recursion must agree on depth accounting without reaching
    the bound."""
    nat = pd.DataFrame(
        {
            "n_nationkey": pd.array([0, 7, 21], dtype="int32"),
            "n_name": pd.array(["A", "B", "C"], dtype="object"),
            "n_regionkey": pd.array([0, 0, 0], dtype="int32"),
        }
    )
    sf = _mk_sf(tmp_path, nation=nat)
    r = check_query("graph_reachability_recursive", spark, sf)
    assert r.ok, str(r)
    # 0 -> 7 -> 21 -> (2*21+7)%25=24 (absent, still visited) -> stop
    got = {
        x.node: (x.first_depth, x.n_visits)
        for x in REGISTRY["graph_reachability_recursive"].fn(spark, sf).collect()
    }
    assert got == {0: (0, 1), 7: (1, 1), 21: (2, 1), 24: (3, 1)}


def test_ann_lsh_fewer_vectors_than_k(spark, tmp_path):
    """3 embeddings, top-5 requested: every query returns its <= 2
    candidates, ranks dense from 1, identical on both engines —
    including a duplicate vector (cosine tie broken by neighbor_id)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=64).astype(np.float32)
    emb = pd.DataFrame(
        {
            "vec_id": pd.array([0, 1, 2], dtype="int64"),
            "embedding": [
                base,
                base.copy(),  # exact duplicate of 0: cosine tie at 1.0
                rng.normal(size=64).astype(np.float32),
            ],
            "label": pd.array([0, 0, 1], dtype="int32"),
        }
    )
    sf = _mk_sf(tmp_path, embeddings=emb)
    for name in ("ann_cosine_topk_lsh", "ann_cosine_topk_lsh_exact"):
        r = check_query(name, spark, sf)
        assert r.ok, f"{name}: {r}"


def test_bpe_family_degenerate_corpora(spark, tmp_path):
    """Single-character docs (no adjacent pair exists), all-identical
    docs, and an empty-string doc: merges/vocab/encode must agree on
    all three engines' worth of edge behavior."""
    texts = ["a", "a", "b", "", "zz zz zz", "zz zz zz", "z z"]
    sf = _mk_sf(tmp_path, documents=_docs(texts))
    for name in ("text_bpe_merges", "text_bpe_vocab", "text_bpe_encode"):
        r = check_query(name, spark, sf)
        assert r.ok, f"{name}: {r}"
